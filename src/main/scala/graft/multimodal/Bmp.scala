package graft.multimodal

/** Pure-JVM Windows BMP (DIB v3) codec — a REAL raster decoder plus the
  * matching encoder used to synthesize fixtures. BMP is the last
  * header-simple raster format crawl corpora carry that the engine did
  * not decode (PNG/JPEG/GIF/TIFF are q108/q109/q110/q143); the format
  * is public-spec (BITMAPFILEHEADER + BITMAPINFOHEADER, MSDN layout)
  * and dependency-free — little-endian fields, 4-byte-aligned rows,
  * an optional BGRX palette and one run-length coding (BI_RLE8).
  *
  * SCOPE: BITMAPINFOHEADER (biSize >= 40; the V4/V5 extensions are
  * skipped by offset, their extra fields unread), bit depths 1
  * (palette bilevel), 8 (palette), 24 (BGR) and 32 (BGRX — the pad
  * byte dropped), compression BI_RGB (0) everywhere and BI_RLE8 (1)
  * on 8-bit data (run, absolute, end-of-line, end-of-bitmap and delta
  * escapes; pixels a delta skips are 0, the spec's undefined-pixels
  * convention), bottom-up (positive height) AND top-down (negative
  * height, BI_RGB only — RLE is bottom-up by spec). Palette images
  * expand through the color table to interleaved RGB (channels = 3)
  * unconditionally — palette order is arbitrary, so collapsing "gray-
  * looking" tables to one channel would be data-dependent behavior.
  * 16-bpp, BI_RLE4 and BI_BITFIELDS throw with a clear message (the
  * q108/PNG scope discipline).
  *
  * Reference behavior modeled on the image-bytes columns of
  * /root/reference/data_processing (multimodal payload plumbing); the
  * codec itself follows the public BMP/DIB layout only.
  *
  * Poison posture (shared with Png/Jpeg/Gif/Tiff): every read is
  * bounds-checked, the raster allocation is capped by
  * [[Png.MaxRasterBytes]] BEFORE allocation, and RLE cursors are
  * range-checked per escape — a crafted header throws
  * IllegalArgumentException into the caller's ok=false contract,
  * never OOMs or hangs. */
object Bmp {

  def isBmp(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  private def u16(b: Array[Byte], o: Int): Int = {
    require(o >= 0 && o + 2 <= b.length, s"bmp: read past end at $o")
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  }
  private def u32(b: Array[Byte], o: Int): Long = {
    require(o >= 0 && o + 4 <= b.length, s"bmp: read past end at $o")
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }
  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  /** Decode a BMP payload to the engine's interleaved raster shape. */
  def decode(payload: Array[Byte]): Png.Image = {
    require(isBmp(payload), "bmp: bad magic (expected 'BM')")
    require(payload.length >= 54, "bmp: truncated header")
    val dataOff = u32(payload, 10)
    val hdrSize = u32(payload, 14)
    require(hdrSize >= 40, s"bmp: BITMAPCOREHEADER (size $hdrSize) unsupported")
    val width = i32(payload, 18)
    val rawH = i32(payload, 22)
    val topDown = rawH < 0
    val height = if (topDown) -rawH else rawH
    require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
      s"bmp: bad dimensions ${width}x$rawH")
    require(u16(payload, 26) == 1, "bmp: planes must be 1")
    val bpp = u16(payload, 28)
    val comp = u32(payload, 30)
    require(bpp == 1 || bpp == 8 || bpp == 24 || bpp == 32,
      s"bmp: bit depth $bpp unsupported (1/8/24/32)")
    require(comp == 0L || (comp == 1L && bpp == 8),
      s"bmp: compression $comp unsupported (BI_RGB, BI_RLE8 on 8-bit)")
    require(!(topDown && comp == 1L), "bmp: RLE bitmaps must be bottom-up")

    // palette (BGRX quads) for indexed depths
    val palette: Array[Byte] =
      if (bpp > 8) null
      else {
        val declared = u32(payload, 46)
        val n = if (declared == 0L) 1 << bpp else declared.toInt
        require(n >= 1 && n <= 256, s"bmp: palette size $n out of range")
        val off = 14 + hdrSize.toInt
        require(off + 4L * n <= payload.length, "bmp: palette past end")
        val p = new Array[Byte](n * 3)
        var j = 0
        while (j < n) {
          p(j * 3) = payload(off + j * 4 + 2)     // R
          p(j * 3 + 1) = payload(off + j * 4 + 1) // G
          p(j * 3 + 2) = payload(off + j * 4)     // B
          j += 1
        }
        p
      }
    val nPal = if (palette == null) 0 else palette.length / 3

    val channels = 3
    val outLen = width.toLong * height * channels
    require(outLen <= Png.MaxRasterBytes,
      s"bmp: raster $outLen bytes exceeds ${Png.MaxRasterBytes}-byte cap")
    val out = new Array[Byte](outLen.toInt)
    require(dataOff >= 54 && dataOff <= payload.length,
      s"bmp: pixel data offset $dataOff out of range")

    // indexed row: write palette RGB for index v at (row, col)
    def putIdx(row: Int, colPx: Int, v: Int): Unit = {
      require(v < nPal, s"bmp: palette index $v >= table size $nPal")
      val o = (row * width + colPx) * 3
      out(o) = palette(v * 3)
      out(o + 1) = palette(v * 3 + 1)
      out(o + 2) = palette(v * 3 + 2)
    }
    def outRow(fileRow: Int): Int =
      if (topDown) fileRow else height - 1 - fileRow

    if (comp == 0L) {
      val stride = ((bpp.toLong * width + 31) / 32 * 4).toInt
      require(dataOff + stride.toLong * height <= payload.length,
        "bmp: pixel data truncated")
      var fr = 0
      while (fr < height) {
        val r = outRow(fr)
        val ro = dataOff.toInt + fr * stride
        var c = 0
        bpp match {
          case 24 =>
            while (c < width) {
              val o = (r * width + c) * 3
              out(o) = payload(ro + c * 3 + 2)
              out(o + 1) = payload(ro + c * 3 + 1)
              out(o + 2) = payload(ro + c * 3)
              c += 1
            }
          case 32 =>
            while (c < width) {
              val o = (r * width + c) * 3
              out(o) = payload(ro + c * 4 + 2)
              out(o + 1) = payload(ro + c * 4 + 1)
              out(o + 2) = payload(ro + c * 4)
              c += 1
            }
          case 8 =>
            while (c < width) {
              putIdx(r, c, payload(ro + c) & 0xff)
              c += 1
            }
          case 1 =>
            while (c < width) {
              putIdx(r, c, (payload(ro + (c >> 3)) >> (7 - (c & 7))) & 1)
              c += 1
            }
        }
        fr += 1
      }
    } else {
      // BI_RLE8, bottom-up; un-written pixels (delta/short lines) are 0,
      // which for palette output means palette entry of index 0? No —
      // the spec leaves skipped pixels undefined; the convention (and
      // every decoder's practice) is literal zero bytes, NOT palette[0].
      var p = dataOff.toInt
      var fr = 0
      var c = 0
      var done = false
      while (!done) {
        require(p + 2 <= payload.length, "bmp: RLE stream truncated")
        val n = payload(p) & 0xff
        val v = payload(p + 1) & 0xff
        p += 2
        if (n > 0) { // run
          require(fr < height && c + n <= width,
            s"bmp: RLE run past row end (row $fr col $c len $n)")
          val r = outRow(fr)
          var i = 0
          while (i < n) { putIdx(r, c + i, v); i += 1 }
          c += n
        } else v match {
          case 0 => // end of line
            fr += 1; c = 0
            require(fr <= height, "bmp: RLE rows past bitmap end")
          case 1 => // end of bitmap
            done = true
          case 2 => // delta: skip (dx, dy) — skipped pixels stay 0
            require(p + 2 <= payload.length, "bmp: RLE delta truncated")
            val dx = payload(p) & 0xff
            val dy = payload(p + 1) & 0xff
            p += 2
            c += dx; fr += dy
            require(fr <= height && c <= width, "bmp: RLE delta out of range")
          case k => // absolute run of k literal indices, word-aligned
            require(fr < height && c + k <= width,
              s"bmp: RLE absolute run past row end (row $fr col $c len $k)")
            require(p + k <= payload.length, "bmp: RLE literals truncated")
            val r = outRow(fr)
            var i = 0
            while (i < k) { putIdx(r, c + i, payload(p + i) & 0xff); i += 1 }
            c += k
            p += k + (k & 1) // pad to word boundary
        }
      }
    }
    Png.Image(width, height, channels, out)
  }

  /** Fixture pixel modes for [[encode]]. */
  sealed trait Mode { def bpp: Int }
  /** 24-bit BGR truecolor (BI_RGB). */
  final case object Rgb24 extends Mode { val bpp = 24 }
  /** 32-bit BGRX truecolor (BI_RGB; pad byte written 0xA5, dropped at
    * decode). */
  final case object Rgb32 extends Mode { val bpp = 32 }
  /** 8-bit indexed through a 256-entry synthetic palette
    * (entry j = (7j, 5j, 3j) mod 256); `rle` selects BI_RLE8. */
  final case class Indexed8(rle: Boolean) extends Mode { val bpp = 8 }
  /** 1-bit bilevel through a 2-entry palette (black, white). */
  final case object Bilevel1 extends Mode { val bpp = 1 }

  /** Synthetic palette shared by encoder, decoder tests and the q152
    * oracle: entry j = ((7j)%256, (5j)%256, (3j)%256). */
  def paletteEntry(j: Int): (Int, Int, Int) =
    ((j * 7) % 256, (j * 5) % 256, (j * 3) % 256)

  /** Encode a fixture BMP. `pxl(row, col)` yields the mode's per-pixel
    * value: the palette INDEX for Indexed8, 0/1 for Bilevel1, and the
    * base value v for truecolor where channel k stores (v + 11k) % 256.
    * `topDown` writes a negative-height BI_RGB bitmap. */
  def encode(width: Int, height: Int, mode: Mode, topDown: Boolean,
             pxl: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    require(!(topDown && mode == Indexed8(true)),
      "RLE bitmaps are bottom-up by spec")
    val bpp = mode.bpp
    val nPal = mode match {
      case Indexed8(_) => 256
      case Bilevel1 => 2
      case _ => 0
    }
    val stride = ((bpp * width + 31) / 32) * 4
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }

    // pixel data, file rows in storage order
    val data = new java.io.ByteArrayOutputStream()
    def srcRow(fileRow: Int): Int =
      if (topDown) fileRow else height - 1 - fileRow
    mode match {
      case Indexed8(true) =>
        var fr = 0
        while (fr < height) {
          val r = srcRow(fr)
          // alternate run-packing and absolute (literal) coding per row
          // so both escape families are exercised
          var c = 0
          while (c < width) {
            val v = pxl(r, c)
            var run = 1
            while (c + run < width && pxl(r, c + run) == v && run < 255)
              run += 1
            if (run >= 3 || r % 2 == 0) {
              data.write(run); data.write(v)
              c += run
            } else {
              // absolute block of up to 6 literals (>= 3 by spec)
              var k = math.min(math.min(6, width - c), 255)
              if (k < 3) {
                // too short for an absolute block — per-pixel run-1 pairs
                // (a single (k, v) pair would repeat ONE value k times)
                var i = 0
                while (i < k) { data.write(1); data.write(pxl(r, c + i)); i += 1 }
                c += k
              } else {
                data.write(0); data.write(k)
                var i = 0
                while (i < k) { data.write(pxl(r, c + i)); i += 1 }
                if ((k & 1) == 1) data.write(0)
                c += k
              }
            }
          }
          data.write(0); data.write(if (fr == height - 1) 1 else 0)
          fr += 1
        }
      case _ =>
        val rowBuf = new Array[Byte](stride)
        var fr = 0
        while (fr < height) {
          java.util.Arrays.fill(rowBuf, 0.toByte)
          val r = srcRow(fr)
          var c = 0
          while (c < width) {
            val v = pxl(r, c)
            mode match {
              case Rgb24 =>
                rowBuf(c * 3) = ((v + 22) % 256).toByte      // B = v+11*2
                rowBuf(c * 3 + 1) = ((v + 11) % 256).toByte  // G
                rowBuf(c * 3 + 2) = (v % 256).toByte         // R
              case Rgb32 =>
                rowBuf(c * 4) = ((v + 22) % 256).toByte
                rowBuf(c * 4 + 1) = ((v + 11) % 256).toByte
                rowBuf(c * 4 + 2) = (v % 256).toByte
                rowBuf(c * 4 + 3) = 0xa5.toByte
              case Indexed8(false) =>
                rowBuf(c) = (v & 0xff).toByte
              case Bilevel1 =>
                if (v != 0)
                  rowBuf(c >> 3) = (rowBuf(c >> 3) | (1 << (7 - (c & 7)))).toByte
              case Indexed8(true) => // handled above
            }
            c += 1
          }
          data.write(rowBuf)
          fr += 1
        }
    }
    val px = data.toByteArray
    val dataOff = 14 + 40 + 4 * nPal
    // file header
    bos.write('B'); bos.write('M')
    w32(dataOff.toLong + px.length); w16(0); w16(0); w32(dataOff.toLong)
    // BITMAPINFOHEADER
    w32(40); w32(width.toLong & 0xffffffffL)
    w32((if (topDown) -height else height).toLong & 0xffffffffL)
    w16(1); w16(bpp)
    w32(if (mode == Indexed8(true)) 1L else 0L)
    w32(px.length.toLong); w32(2835); w32(2835); w32(nPal.toLong); w32(0)
    // palette (BGRX)
    var j = 0
    while (j < nPal) {
      val (r, g, b) =
        if (mode == Bilevel1) (if (j == 0) (0, 0, 0) else (255, 255, 255))
        else paletteEntry(j)
      bos.write(b); bos.write(g); bos.write(r); bos.write(0)
      j += 1
    }
    bos.write(px)
    bos.toByteArray
  }
}
