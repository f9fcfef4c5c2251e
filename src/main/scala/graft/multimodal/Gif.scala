package graft.multimodal

/** Pure-JVM GIF decoder — a REAL pixel decoder (not a stub): the full
  * GIF87a/89a stream walk (logical screen descriptor, global/local color
  * tables, extension blocks skipped by their sub-block chains, image
  * descriptor), LZW decompression with growing code widths and clear-code
  * resets, Adam-less 4-pass interlace de-weaving, and palette expansion
  * to RGB. GIF needs no codec library — LZW is table arithmetic — so,
  * like [[Png]] and [[Jpeg]], this path carries no fake anywhere. GIF is
  * LOSSLESS, which makes cross-decoder verification exact: `GifSpec`
  * checks decode∘encode identity and bit-exact agreement with the JDK
  * ImageIO reader/writer in both directions.
  *
  * SCOPE: [[decode]] returns the first image (the crawl-ingestion
  * semantics for a still); [[decodeFrames]] returns EVERY image of an
  * animated stream as an independent full frame — full-canvas frames
  * only (each descriptor must cover the whole logical screen at offset
  * 0,0; partial-update frames with disposal compositing throw — that is
  * presentation-layer state, not per-frame content). Global or local
  * color table, interlaced or sequential, any code size 2..8.
  * Transparency (GCE) is ignored — the transparent index still maps to
  * its palette RGB, matching a "flatten to RGB" ingest. Malformed input
  * throws IllegalArgumentException; header-driven allocations are
  * overflow-checked in Long and capped (the [[Png]] poison lesson).
  *
  * Reference behavior modeled on the image-bytes columns of
  * /root/reference/data_processing (multimodal payload plumbing); the
  * codec itself follows the public GIF89a specification only.
  */
object Gif {

  /** Same hard allocation ceiling as [[Png.MaxRasterBytes]]. */
  val MaxRasterBytes: Long = Png.MaxRasterBytes

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Decode a GIF byte array to the first image's RGB raster. */
  def decode(gif: Array[Byte]): Png.Image = walk(gif, firstOnly = true).head

  /** Decode EVERY image of a (possibly animated) GIF as independent
    * full-canvas RGB frames — see SCOPE in the object doc. */
  def decodeFrames(gif: Array[Byte]): Array[Png.Image] =
    walk(gif, firstOnly = false)

  private def walk(gif: Array[Byte], firstOnly: Boolean): Array[Png.Image] = {
    require(gif.length >= 13 &&
      gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F' && gif(3) == '8' &&
      (gif(4) == '7' || gif(4) == '9') && gif(5) == 'a',
      "not a GIF: bad signature")
    // logical screen descriptor
    val packed = gif(10) & 0xff
    var off = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      require(off + 3 * n <= gif.length, "truncated global color table")
      gct = java.util.Arrays.copyOfRange(gif, off, off + 3 * n)
      off += 3 * n
    }
    val screenW = u16(gif, 6)
    val screenH = u16(gif, 8)
    val frames = Array.newBuilder[Png.Image]
    var nFrames = 0
    var done = false
    def skipSubBlocks(): Unit = {
      var bs = if (off < gif.length) gif(off) & 0xff else -1
      while (bs > 0) {
        require(off + 1 + bs <= gif.length, "truncated sub-block")
        off += 1 + bs
        bs = if (off < gif.length) gif(off) & 0xff else -1
      }
      require(bs == 0, "truncated sub-block terminator")
      off += 1
    }
    while (off < gif.length && !done) {
      (gif(off) & 0xff) match {
        case 0x21 => // extension: label + sub-block chain
          require(off + 2 <= gif.length, "truncated extension")
          off += 2
          skipSubBlocks()
        case 0x2c => // image descriptor
          require(off + 10 <= gif.length, "truncated image descriptor")
          val left = u16(gif, off + 1)
          val top = u16(gif, off + 3)
          val w = u16(gif, off + 5)
          val h = u16(gif, off + 7)
          val ipacked = gif(off + 9) & 0xff
          val interlaced = (ipacked & 0x40) != 0
          if (!firstOnly)
            require(left == 0 && top == 0 && w == screenW && h == screenH,
              s"partial-update frame (${w}x$h at $left,$top on " +
                s"${screenW}x$screenH) unsupported — full-canvas frames only")
          off += 10
          var ct = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            require(off + 3 * n <= gif.length, "truncated local color table")
            ct = java.util.Arrays.copyOfRange(gif, off, off + 3 * n)
            off += 3 * n
          }
          require(ct != null, "no color table for image")
          require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
          require(Math.multiplyExact(Math.multiplyExact(
            Math.multiplyExact(w.toLong, h.toLong), 4L),
            (nFrames + 1).toLong) <= MaxRasterBytes,
            s"raster ${w}x$h x ${nFrames + 1} frames exceeds " +
              s"$MaxRasterBytes-byte cap")
          require(off + 1 <= gif.length, "truncated LZW header")
          val minCode = gif(off) & 0xff
          require(minCode >= 2 && minCode <= 8, s"bad LZW min code size $minCode")
          off += 1
          val lzwStart = off
          val idx = lzwDecode(gif, lzwStart, minCode, w * h)
          val out = new Array[Byte](w * h * 3)
          val nColors = ct.length / 3
          val order = rowOrder(h, interlaced)
          var y = 0
          while (y < h) {
            val destRow = order(y)
            var x = 0
            while (x < w) {
              val ci = idx(y * w + x) & 0xff
              require(ci < nColors, s"palette index $ci >= $nColors")
              val d = (destRow * w + x) * 3
              out(d) = ct(ci * 3)
              out(d + 1) = ct(ci * 3 + 1)
              out(d + 2) = ct(ci * 3 + 2)
              x += 1
            }
            y += 1
          }
          frames += Png.Image(w, h, 3, out)
          nFrames += 1
          if (firstOnly) done = true
          else skipSubBlocks() // structurally skip the LZW chain
        case 0x3b => // trailer
          require(nFrames > 0, "GIF trailer before any image")
          done = true
        case b =>
          throw new IllegalArgumentException(f"unexpected GIF block 0x$b%02X")
      }
    }
    require(nFrames > 0, "no image descriptor in GIF")
    frames.result()
  }

  /** Interlace de-weave: source row i (decode order) -> display row.
    * Pass rows: 0,8,16.. then 4,12.. then 2,6,10.. then 1,3,5.. */
  private def rowOrder(h: Int, interlaced: Boolean): Array[Int] =
    if (!interlaced) Array.tabulate(h)(identity)
    else {
      val order = new Array[Int](h)
      var i = 0
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
           y <- start until h by step) {
        order(i) = y; i += 1
      }
      order
    }

  /** GIF-flavor LZW decode over the sub-block chain at `off`: LSB-first
    * bit packing, clear/end codes, code width grows at table sizes
    * 2^n up to 12 bits. Emits exactly `expect` indices (trailing codes
    * ignored, truncation throws). */
  private def lzwDecode(b: Array[Byte], off0: Int, minCode: Int,
                        expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var produced = 0
    val clear = 1 << minCode
    val end = clear + 1
    // dictionary as prefix links: suffix byte + prefix code per entry
    val maxEntries = 4096
    val prefix = new Array[Int](maxEntries)
    val suffix = new Array[Byte](maxEntries)
    var next = end + 1
    var width = minCode + 1
    var prev = -1
    // bit reader over sub-blocks
    var off = off0
    var blockEnd = off // exclusive end of current sub-block's data
    var acc = 0L
    var bits = 0
    val stack = new Array[Byte](maxEntries)
    def fill(): Unit = {
      while (bits < width) {
        if (off == blockEnd) {
          require(off < b.length, "truncated LZW stream")
          val bs = b(off) & 0xff
          require(bs > 0, "LZW data ended before all pixels were produced")
          require(off + 1 + bs <= b.length, "truncated LZW sub-block")
          off += 1
          blockEnd = off + bs
        }
        acc |= (b(off) & 0xffL) << bits
        bits += 8
        off += 1
      }
    }
    def emit(code: Int): Unit = {
      var sp = 0
      var c = code
      while (c >= clear) { // walk prefix chain (codes < clear are roots)
        require(sp < maxEntries && c < next, s"corrupt LZW code $c")
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      require(produced + sp + 1 <= expect,
        "LZW produced more pixels than the image holds")
      out(produced) = c.toByte; produced += 1
      while (sp > 0) { sp -= 1; out(produced) = stack(sp); produced += 1 }
    }
    while (produced < expect) {
      fill()
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      bits -= width
      if (code == clear) {
        next = end + 1; width = minCode + 1; prev = -1
      } else if (code == end) {
        throw new IllegalArgumentException(
          "LZW end code before all pixels were produced")
      } else if (prev < 0) {
        require(code < clear, s"first LZW code $code must be a literal")
        emit(code)
        prev = code
      } else {
        require(code <= next, s"LZW code $code out of sequence")
        val firstOfCode =
          if (code == next) firstByte(code, prev, clear, prefix, suffix)
          else firstByte(code + 1, code, clear, prefix, suffix)
        if (next < maxEntries) {
          prefix(next) = prev
          suffix(next) = firstOfCode
          next += 1
          if (next < maxEntries && (next & (next - 1)) == 0 && width < 12)
            width += 1
        }
        emit(code)
        prev = code
      }
    }
    out
  }

  /** First byte of the string a code expands to. For the KwKwK case the
    * caller passes (next, prev): the first byte of prev's expansion. */
  private def firstByte(nextCode: Int, code: Int, clear: Int,
                        prefix: Array[Int], suffix: Array[Byte]): Byte = {
    var c = code
    while (c >= clear) {
      require(c < nextCode, s"corrupt LZW prefix chain at $c")
      c = prefix(c)
    }
    c.toByte
  }

  /** Palette + per-pixel indices for an RGB raster (≤256 distinct colors
    * required — fixture scope). Returns (palette, indices, ctBits) with
    * table size 2^ctBits. */
  private def paletteIndex(img: Png.Image): (Array[Int], Array[Byte], Int) = {
    val Png.Image(w, h, c, px) = img
    require(c == 3, "GIF encode expects an RGB raster")
    require(px.length == w * h * 3, "pixel buffer size mismatch")
    val colorOf = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    val idx = new Array[Byte](w * h)
    var i = 0
    while (i < w * h) {
      val rgb = ((px(i * 3) & 0xff) << 16) |
        ((px(i * 3 + 1) & 0xff) << 8) | (px(i * 3 + 2) & 0xff)
      idx(i) = colorOf.getOrElseUpdate(rgb, colorOf.size).toByte
      i += 1
    }
    require(colorOf.size <= 256, s"${colorOf.size} colors exceed a GIF palette")
    var ctBits = 1
    while ((2 << (ctBits - 1)) < colorOf.size) ctBits += 1
    (colorOf.keys.toArray, idx, ctBits)
  }

  /** Descriptor + color table + REAL LZW for one full-canvas image.
    * `lct` writes the palette as a LOCAL color table (the animated
    * layout); otherwise the caller has already written it globally. */
  private def writeImage(out: java.io.ByteArrayOutputStream, img: Png.Image,
                         palette: Array[Int], idx: Array[Byte], ctBits: Int,
                         interlaced: Boolean, lct: Boolean): Unit = {
    def put16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    val nColors = 2 << (ctBits - 1)
    val minCode = math.max(2, ctBits)
    out.write(0x2c)
    put16(0); put16(0); put16(img.width); put16(img.height)
    out.write((if (interlaced) 0x40 else 0x00) |
      (if (lct) 0x80 | (ctBits - 1) else 0x00))
    if (lct) for (j <- 0 until nColors) {
      val rgb = if (j < palette.length) palette(j) else 0
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff); out.write(rgb & 0xff)
    }
    out.write(minCode)
    val order = rowOrder(img.height, interlaced)
    val seq = new Array[Byte](img.width * img.height)
    var y = 0
    while (y < img.height) {
      System.arraycopy(idx, order(y) * img.width, seq, y * img.width, img.width)
      y += 1
    }
    lzwEncode(seq, minCode, out)
  }

  /** Encode an RGB raster as a GIF87a/89a with a global color table built
    * from the image's distinct colors (≤256 required — fixture scope),
    * REAL LZW compression, and optional interlace. Channels must be 3. */
  def encode(img: Png.Image, interlaced: Boolean = false): Array[Byte] = {
    val (palette, idx, ctBits) = paletteIndex(img)
    val nColors = 2 << (ctBits - 1)
    val out = new java.io.ByteArrayOutputStream()
    def put16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    put16(img.width); put16(img.height)
    out.write(0x80 | (ctBits - 1)) // GCT present, size
    out.write(0); out.write(0)     // background, aspect
    for (j <- 0 until nColors) {
      val rgb = if (j < palette.length) palette(j) else 0
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff); out.write(rgb & 0xff)
    }
    writeImage(out, img, palette, idx, ctBits, interlaced, lct = false)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Encode uniform full-canvas RGB frames as an animated GIF89a: a
    * Netscape-free minimal layout — each frame carries its own LOCAL
    * color table (palettes may differ per frame) and a graphic-control
    * extension with a fixed delay, so external viewers animate it and
    * [[decodeFrames]] gets the LCT + extension-skip paths exercised. */
  def encodeAnimated(frames: Array[Png.Image],
                     interlaced: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    val w = frames(0).width; val h = frames(0).height
    frames.foreach(f => require(f.width == w && f.height == h,
      "animated frames must share dimensions"))
    val out = new java.io.ByteArrayOutputStream()
    def put16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    put16(w); put16(h)
    out.write(0x00) // no global color table
    out.write(0); out.write(0)
    frames.foreach { img =>
      // graphic control extension: 10 cs delay, no transparency
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); put16(10); out.write(0); out.write(0)
      val (palette, idx, ctBits) = paletteIndex(img)
      writeImage(out, img, palette, idx, ctBits, interlaced, lct = true)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** GIF-flavor LZW compress: dictionary keyed (prefixCode, byte), clear
    * code first, width grows when `next` crosses 2^width, dictionary
    * reset at 4096. Output chunked into ≤255-byte sub-blocks. */
  private def lzwEncode(seq: Array[Byte], minCode: Int,
                        out: java.io.ByteArrayOutputStream): Unit = {
    val clear = 1 << minCode
    val end = clear + 1
    val block = new Array[Byte](255)
    var blockLen = 0
    var acc = 0L
    var bits = 0
    def flushByte(): Unit = {
      while (bits >= 8) {
        block(blockLen) = (acc & 0xff).toByte
        blockLen += 1
        acc >>>= 8; bits -= 8
        if (blockLen == 255) { out.write(255); out.write(block, 0, 255); blockLen = 0 }
      }
    }
    var width = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << bits
      bits += width
      flushByte()
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var next = end + 1
    put(clear)
    if (seq.nonEmpty) {
      var prev: Int = seq(0) & 0xff
      var i = 1
      while (i < seq.length) {
        val k = seq(i) & 0xff
        val key = Integer.valueOf((prev << 8) | k)
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          if (next == (1 << width) && width < 12) width += 1
          dict.put(key, Integer.valueOf(next))
          next += 1
          if (next == 4096) { // dictionary full: reset
            put(clear)
            dict.clear()
            next = end + 1
            width = minCode + 1
          }
          prev = k
        }
        i += 1
      }
      put(prev)
    }
    put(end)
    if (bits > 0) { // pad the final partial byte
      bits = 8
      flushByte()
    }
    if (blockLen > 0) { out.write(blockLen); out.write(block, 0, blockLen) }
    out.write(0) // block terminator
  }
}
