package graft.parse

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WebP container metadata probe — `webp_meta(binary)` returns
  * struct(ok, format, width, height, has_alpha, has_anim) straight from
  * the RIFF container and VP8/VP8L/VP8X headers; no bitstream decode
  * (full VP8 entropy decode is codec-library territory — the engine's
  * established stub boundary; the container METADATA is public-spec
  * header layout, the same advisory posture as the EXIF orientation
  * probe). Crawl image pipelines meet WebP constantly, and routing /
  * dimension-bucketing / alpha- and animation-filtering only need these
  * fields — this keeps them inside WholeStageCodegen, no decoder, no
  * UDF.
  *
  * Header layouts (public WebP container + VP8/VP8L specs):
  *  - RIFF: "RIFF" + le32 payload size + "WEBP", then fourcc chunks
  *    (le32 sizes, odd sizes padded).
  *  - "VP8 " (simple lossy): 3-byte frame tag (bit 0 = 0 for the
  *    mandatory keyframe), start code 9D 01 2A, then le14 width/height
  *    (2 high bits are rescale hints). Never alpha, never animation.
  *  - "VP8L" (simple lossless): signature byte 2F, then a le32 word:
  *    14-bit width-1, 14-bit height-1, 1 alpha bit, 3-bit version
  *    (must be 0).
  *  - "VP8X" (extended): 10-byte payload — flags byte (0x20 ICC,
  *    0x10 alpha, 0x08 EXIF, 0x04 XMP, 0x02 animation), 3 reserved
  *    bytes, le24 canvas width-1, le24 canvas height-1.
  *
  * Malformed payloads (wrong magic, inconsistent sizes, bad start
  * codes, truncation) yield ok=false with null fields — never an
  * exception, the 100 TB garbage-bytes contract. */
case class WebpMetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"webp_meta requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = WebpMetaExpr.schema

  override protected def nullSafeEval(input: Any): Any =
    WebpMetaExpr.meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.parse.WebpMetaExpr.meta($c)")

  override protected def withNewChildInternal(newChild: Expression): WebpMetaExpr =
    copy(child = newChild)

  override def prettyName: String = "webp_meta"
}

object WebpMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("has_alpha", BooleanType),
    StructField("has_anim", BooleanType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType)))

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le24(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], o: Int, s: String): Boolean =
    b(o) == s.charAt(0).toByte && b(o + 1) == s.charAt(1).toByte &&
      b(o + 2) == s.charAt(2).toByte && b(o + 3) == s.charAt(3).toByte

  private val Bad: InternalRow = new GenericInternalRow(
    Array[Any](false, null, null, null, null, null, null, null))

  private def good(format: String, w: Int, h: Int, alpha: Boolean,
                   anim: Boolean, nFrames: Any = null,
                   durationMs: Any = null): InternalRow =
    new GenericInternalRow(Array[Any](
      true, UTF8String.fromString(format), w, h, alpha, anim,
      nFrames, durationMs))

  def meta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 20) return Bad
    if (!fourcc(b, 0, "RIFF") || !fourcc(b, 8, "WEBP")) return Bad
    val riffSize = le32(b, 4)
    if (riffSize + 8 != b.length) return Bad
    // first chunk decides the format
    val size = le32(b, 16)
    if (20 + size > b.length) return Bad
    if (fourcc(b, 12, "VP8 ")) {
      // keyframe header: 3-byte tag (bit 0 must be 0 = keyframe),
      // start code, le14 dims
      if (size < 10) return Bad
      if ((b(20) & 0x01) != 0) return Bad // interframe can't lead a file
      if ((b(23) & 0xff) != 0x9d || (b(24) & 0xff) != 0x01 ||
          (b(25) & 0xff) != 0x2a) return Bad
      val w = le16(b, 26) & 0x3fff
      val h = le16(b, 28) & 0x3fff
      if (w == 0 || h == 0) return Bad
      good("lossy", w, h, alpha = false, anim = false)
    } else if (fourcc(b, 12, "VP8L")) {
      if (size < 5 || (b(20) & 0xff) != 0x2f) return Bad
      val word = le32(b, 21)
      val version = (word >> 29) & 0x7
      if (version != 0) return Bad
      val w = ((word & 0x3fff) + 1).toInt
      val h = (((word >> 14) & 0x3fff) + 1).toInt
      good("lossless", w, h, alpha = ((word >> 28) & 1) == 1, anim = false)
    } else if (fourcc(b, 12, "VP8X")) {
      if (size != 10 || b.length < 30) return Bad
      val flags = b(20) & 0xff
      if ((flags & 0xc1) != 0) return Bad // reserved bits must be 0
      val w = le24(b, 24) + 1
      val h = le24(b, 27) + 1
      val anim = (flags & 0x02) != 0
      if (!anim)
        return good("extended", w, h, alpha = (flags & 0x10) != 0,
          anim = false)
      // animation: walk the remaining chunks counting ANMF frames and
      // summing their 24-bit millisecond durations (the fields an
      // animation filter needs — frame PIXELS stay codec territory).
      // Chunk sizes are validated as we go; a lying size is malformed.
      var off = 20L + size + (size & 1)
      var nFrames = 0
      var durationMs = 0L
      while (off + 8 <= b.length) {
        val csize = le32(b, (off + 4).toInt)
        if (off + 8 + csize > b.length) return Bad
        if (fourcc(b, off.toInt, "ANMF")) {
          if (csize < 16) return Bad // frame header is 16 bytes
          nFrames += 1
          durationMs += le24(b, (off + 8 + 12).toInt)
        }
        off += 8 + csize + (csize & 1)
      }
      if (off != b.length) return Bad // trailing garbage / lying size
      good("extended", w, h, alpha = (flags & 0x10) != 0, anim = true,
        nFrames = nFrames, durationMs = durationMs)
    } else Bad
  }
}
