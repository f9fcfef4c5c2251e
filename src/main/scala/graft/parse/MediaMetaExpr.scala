package graft.parse

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-format metadata decode for multimodal binary columns: parses
  * PNG (IHDR), WAV (RIFF/fmt), GIF (logical screen descriptor), JPEG
  * (marker walk to the first SOFn), WebP (RIFF/VP8* chunk headers, via
  * [[WebpMetaExpr]]) and TIFF (endian-tagged IFD walk for
  * width/height/samples) headers straight from the byte
  * stream — real format parsing, not a stub; no codec library required
  * because only the header layout is read, never the sample data. Unknown/truncated payloads yield
  * kind='unknown' with null fields (never an exception — a 100 TB crawl
  * always contains garbage bytes); a JPEG whose headers are damaged past
  * SOI still reports kind='jpeg' with null dims (best-effort, bounded
  * walk).
  *
  * This is the "typed metadata over opaque binary" layer of the multimodal
  * pipeline (SURVEY-adjacent; the reference has no media path): metadata
  * stays inside WholeStageCodegen so filtering/bucketing by
  * dimensions/sample-rate never touches a decoder.
  */
case class MediaMetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"media_meta requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = MediaMetaExpr.schema

  override protected def nullSafeEval(input: Any): Any =
    MediaMetaExpr.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.parse.MediaMetaExpr.meta($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaMetaExpr =
    copy(child = newChild)

  override def prettyName: String = "media_meta"
}

object MediaMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType)))

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def ascii(b: Array[Byte], o: Int, s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (b(o + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  private def row(kind: String, width: Any = null, height: Any = null,
                  channels: Any = null, sampleRate: Any = null): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(kind), width, height, channels, sampleRate))

  def meta(bytes: Array[Byte]): InternalRow = {
    // PNG: signature, then the IHDR chunk (length + "IHDR" + 13-byte body)
    if (bytes.length >= 26 && java.util.Arrays.equals(
        java.util.Arrays.copyOf(bytes, 8), PngSig) &&
        ascii(bytes, 12, "IHDR")) {
      val colorType = bytes(25) & 0xff
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => -1
      }
      if (channels > 0)
        return row("png", be32(bytes, 16), be32(bytes, 20), channels)
    }
    // WAV: RIFF container with a WAVE type and the fmt subchunk layout
    if (bytes.length >= 36 && ascii(bytes, 0, "RIFF") &&
        ascii(bytes, 8, "WAVE") && ascii(bytes, 12, "fmt ")) {
      return row("wav", channels = le16(bytes, 22),
        sampleRate = le32(bytes, 24))
    }
    // WebP: RIFF container typed WEBP — dims/alpha live in the chunk
    // headers; delegate to the dedicated webp_meta parser and surface
    // the dims here (format/alpha/animation detail stays webp_meta's)
    if (bytes.length >= 20 && ascii(bytes, 0, "RIFF") &&
        ascii(bytes, 8, "WEBP")) {
      val m = WebpMetaExpr.meta(bytes)
      return if (m.getBoolean(0)) row("webp", m.getInt(2), m.getInt(3))
      else row("webp")
    }
    // TIFF: endian-tagged header + first IFD's ImageWidth/ImageLength/
    // SamplesPerPixel (best-effort: a valid mark with a damaged IFD
    // reports kind='tiff' with null dims, the JPEG degradation rule)
    if (bytes.length >= 8 &&
        ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) ||
          (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42))) {
      val le = bytes(0) == 'I'
      def u16(o: Int): Int =
        if (le) le16(bytes, o)
        else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
      def u32(o: Int): Long =
        if (le) le32(bytes, o) & 0xffffffffL
        else be32(bytes, o) & 0xffffffffL
      try {
        val ifd = u32(4)
        require(ifd >= 8 && ifd + 2 <= bytes.length)
        val n = u16(ifd.toInt)
        require(n >= 1 && n <= 512 && ifd + 2 + 12L * n <= bytes.length)
        var w = -1L; var h = -1L; var spp = 1L
        var i = 0
        while (i < n) {
          val e = ifd.toInt + 2 + 12 * i
          val tag = u16(e)
          val typ = u16(e + 2)
          if (tag == 256 || tag == 257 || tag == 277) {
            val v = typ match {
              case 3 => u16(e + 8).toLong
              case 4 => u32(e + 8)
              case _ => -1L
            }
            if (tag == 256) w = v else if (tag == 257) h = v else spp = v
          }
          i += 1
        }
        require(w >= 1 && h >= 1 && w <= (1 << 20) && h <= (1 << 20))
        return row("tiff", w.toInt, h.toInt, spp.toInt)
      } catch {
        case _: IllegalArgumentException => return row("tiff")
      }
    }
    // GIF: signature + logical screen descriptor (LE dims; palette
    // always expands to RGB on the decode path, so channels = 3)
    if (bytes.length >= 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') {
      return row("gif", le16(bytes, 6), le16(bytes, 8), 3)
    }
    // JPEG: SOI, then a bounded marker walk to the first SOFn frame
    // header (dims + component count live there; any SOF flavor has the
    // same layout, so progressive files still report dims). Bounded and
    // exception-free: segment irregularities after a valid SOI degrade to
    // kind='jpeg' with null dims.
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8) {
      var off = 2
      var guard = 0
      while (off + 4 <= bytes.length && guard < 4096) {
        guard += 1
        if ((bytes(off) & 0xff) != 0xff) return row("jpeg")
        var m = bytes(off + 1) & 0xff
        while (m == 0xff && off + 3 <= bytes.length) { // fill bytes
          off += 1; m = bytes(off + 1) & 0xff
        }
        if (m == 0xd9 || m == 0xda) return row("jpeg") // EOI/SOS: no SOF seen
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) off += 2 // standalone
        else {
          val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
          if (len < 2 || off + 2 + len > bytes.length) return row("jpeg")
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (len < 8 || off + 10 > bytes.length) return row("jpeg")
            val h = ((bytes(off + 5) & 0xff) << 8) | (bytes(off + 6) & 0xff)
            val w = ((bytes(off + 7) & 0xff) << 8) | (bytes(off + 8) & 0xff)
            return row("jpeg", w, h, bytes(off + 9) & 0xff)
          }
          off += 2 + len
        }
      }
      return row("jpeg")
    }
    row("unknown")
  }
}
