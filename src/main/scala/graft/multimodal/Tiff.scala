package graft.multimodal

/** Pure-JVM baseline TIFF 6.0 codec — a REAL raster decoder (not a
  * stub), plus the matching encoder used to synthesize fixtures. The
  * engine already walked TIFF IFDs for EXIF metadata (Jpeg's APP1
  * parser, q140); this module decodes the TIFF RASTERS crawl corpora
  * actually contain. Baseline TIFF is public-spec and dependency-free:
  * the container is an endian-tagged header + one IFD of (tag, type,
  * count, value) entries, and the codings — raw bytes, PackBits
  * run-length and §13 LZW (MSB-first early-change codes) — are pure
  * arithmetic, so this path carries no fake anywhere.
  *
  * SCOPE (TIFF 6.0 Part 1 "Baseline TIFF" + the §13/§14/§15
  * extensions): both byte orders (II little / MM big), BOTH segment
  * layouts — strips with RowsPerStrip and §15 tiles (zero-padded edge
  * tiles); bilevel (1-bit, §3), grayscale 8-bit (§4) and full-color
  * RGB 8/8/8 (§6); Compression 1 (none), 5 (LZW, §13 — MSB-first bit
  * order, early-change width growth, per-segment streams) and 32773
  * (PackBits, §9); the §14 horizontal-differencing predictor
  * (tag 317 = 2) on 8-bit samples; Photometric 0 (WhiteIsZero), 1
  * (BlackIsZero), 2 (RGB). Chunky planar config only
  * (PlanarConfiguration 2, palette and 16-bit depths throw with a
  * clear message — the q108/PNG scope discipline). WhiteIsZero
  * data is normalized at decode (inverted) so downstream pixel stats
  * read photometric-true intensities.
  *
  * Reference behavior modeled on the image-bytes columns of
  * /root/reference/data_processing (multimodal payload plumbing); the
  * codec itself follows the public TIFF 6.0 spec only.
  *
  * Poison posture (shared with Png/Jpeg/Gif): every read is
  * bounds-checked, strip/IFD counts are capped, the raster allocation
  * is capped by [[Png.MaxRasterBytes]] BEFORE allocation — a crafted
  * header throws IllegalArgumentException into the caller's ok=false
  * contract, never OOMs or hangs.
  */
object Tiff {

  /** Cap on IFD entries and strips a payload may declare — far above any
    * real baseline file, low enough that a crafted count cannot drive a
    * large allocation or scan. */
  val MaxIfdEntries = 512
  val MaxStrips = 65536

  def isTiff(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  // ---- bounds-checked endian reader -----------------------------------
  private final class Rd(b: Array[Byte], le: Boolean) {
    val len: Int = b.length
    def u8(o: Long): Int = {
      require(o >= 0 && o < len, s"TIFF: read past end at $o/$len")
      b(o.toInt) & 0xff
    }
    def u16(o: Long): Int = {
      require(o >= 0 && o + 2 <= len, s"TIFF: read past end at $o/$len")
      val x = b(o.toInt) & 0xff; val y = b(o.toInt + 1) & 0xff
      if (le) x | (y << 8) else (x << 8) | y
    }
    def u32(o: Long): Long = {
      require(o >= 0 && o + 4 <= len, s"TIFF: read past end at $o/$len")
      val p = o.toInt
      val (a, c, d, e) = (b(p) & 0xffL, b(p + 1) & 0xffL,
        b(p + 2) & 0xffL, b(p + 3) & 0xffL)
      if (le) a | (c << 8) | (d << 16) | (e << 24)
      else (a << 24) | (c << 16) | (d << 8) | e
    }
    def slice(o: Long, n: Long): Array[Byte] = {
      require(o >= 0 && n >= 0 && o + n <= len,
        s"TIFF: strip [$o,+$n) past end of $len-byte payload")
      java.util.Arrays.copyOfRange(b, o.toInt, (o + n).toInt)
    }
  }

  /** One parsed IFD entry's values, widened to Long. */
  private def entryValues(rd: Rd, entryOff: Long): (Int, Seq[Long]) = {
    val tag = rd.u16(entryOff)
    val typ = rd.u16(entryOff + 2)
    val count = rd.u32(entryOff + 4)
    require(count <= MaxStrips, s"TIFF: tag $tag count $count over cap")
    val elemSize = typ match {
      case 1 => 1 // BYTE
      case 3 => 2 // SHORT
      case 4 => 4 // LONG
      case _ => return (tag, Nil) // RATIONAL etc.: skip (not needed)
    }
    val total = elemSize * count
    val base = if (total <= 4) entryOff + 8 else rd.u32(entryOff + 8)
    val vals = (0L until count).map { i =>
      typ match {
        case 1 => rd.u8(base + i).toLong
        case 3 => rd.u16(base + i * 2).toLong
        case 4 => rd.u32(base + i * 4)
      }
    }
    (tag, vals)
  }

  /** TIFF LZW (TIFF 6.0 §13): 9→12-bit codes MSB-first (the opposite
    * bit order of GIF's LZW), ClearCode 256 / EOI 257, table entries
    * from 258, and the "early change" — the code width grows one code
    * EARLIER than GIF: the decoder widens when its next table index
    * reaches 2^w − 1 (511/1023/2047), the encoder (one entry ahead at
    * emit time) when its next index reaches 2^w. Every strip is an
    * independent stream. Output is exactly `expected` bytes or the
    * payload is malformed (bad codes, missing growth, overruns all
    * throw — never loop or over-allocate). */
  private[multimodal] def lzwDecode(src: Array[Byte],
                                    expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var o = 0
    var bitPos = 0
    val nBits = src.length * 8
    var width = 9
    val table = new Array[Array[Byte]](4096)
    var next = 258
    var prev: Array[Byte] = null
    def read(): Int = {
      require(bitPos + width <= nBits, "TIFF LZW: truncated stream")
      var v = 0; var i = 0
      while (i < width) {
        val b = bitPos + i
        v = (v << 1) | ((src(b >> 3) >> (7 - (b & 7))) & 1)
        i += 1
      }
      bitPos += width
      v
    }
    def emit(e: Array[Byte]): Unit = {
      require(o + e.length <= expected, "TIFF LZW: output overrun")
      System.arraycopy(e, 0, out, o, e.length)
      o += e.length
    }
    var done = false
    while (!done && o < expected) {
      val code = read()
      if (code == 256) { // Clear
        java.util.Arrays.fill(table.asInstanceOf[Array[AnyRef]], 258, 4096, null)
        next = 258; width = 9; prev = null
      } else if (code == 257) done = true // EOI
      else {
        val entry: Array[Byte] =
          if (code < 256) Array(code.toByte)
          else if (code < next && table(code) != null) table(code)
          else if (code == next && prev != null) prev :+ prev(0) // KwKwK
          else throw new IllegalArgumentException(
            s"TIFF LZW: code $code outside table (next=$next)")
        emit(entry)
        if (prev != null && next < 4096) {
          table(next) = prev :+ entry(0)
          next += 1
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        prev = entry
      }
    }
    require(o == expected, s"TIFF LZW: decoded $o of $expected bytes")
    out
  }

  /** Greedy LZW encoder (longest dictionary match), the §13 writer side
    * of [[lzwDecode]]'s early-change contract; clears at 4094 entries. */
  private[multimodal] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nAcc = 0; var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code; nAcc += width
      while (nAcc >= 8) {
        bits.write(((acc >> (nAcc - 8)) & 0xff).toInt); nAcc -= 8
      }
    }
    def flush(): Unit =
      if (nAcc > 0) { bits.write(((acc << (8 - nAcc)) & 0xff).toInt); nAcc = 0 }
    val dict = new java.util.HashMap[Long, Integer]()
    var next = 258
    def reset(): Unit = { dict.clear(); next = 258; width = 9 }
    put(256) // spec: every strip starts with a Clear
    var cur = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (cur < 0) cur = b
      else {
        val key = (cur.toLong << 8) | b
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          put(cur)
          dict.put(key, Integer.valueOf(next))
          next += 1
          if (next == (1 << width) && width < 12) width += 1 // early change
          if (next == 4094) { put(256); reset() }
          cur = b
        }
      }
      i += 1
    }
    if (cur >= 0) put(cur)
    put(257) // EOI
    flush()
    bits.toByteArray
  }

  /** Horizontal-differencing predictor (tag 317 = 2, TIFF §14): each
    * 8-bit sample is stored as the delta from the previous sample of
    * the SAME channel in the row; decode integrates per row. */
  private def undiffRows(data: Array[Byte], rows: Int, rowBytes: Int,
                         samples: Int): Unit = {
    var r = 0
    while (r < rows) {
      var i = r * rowBytes + samples
      val end = (r + 1) * rowBytes
      while (i < end) {
        data(i) = (data(i) + data(i - samples)).toByte
        i += 1
      }
      r += 1
    }
  }

  /** PackBits (TIFF §9): n in [0,127] copies n+1 literals; n in
    * [-127,-1] repeats the next byte 1-n times; -128 is a no-op. Output
    * is exactly `expected` bytes or the payload is malformed. */
  private[multimodal] def packBitsDecode(src: Array[Byte],
                                         expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var i = 0; var o = 0
    while (o < expected) {
      require(i < src.length, "TIFF PackBits: truncated stream")
      val n = src(i); i += 1
      if (n >= 0) {
        val run = n + 1
        require(i + run <= src.length && o + run <= expected,
          "TIFF PackBits: literal run past end")
        System.arraycopy(src, i, out, o, run)
        i += run; o += run
      } else if (n != -128) {
        val run = 1 - n
        require(i < src.length && o + run <= expected,
          "TIFF PackBits: repeat run past end")
        java.util.Arrays.fill(out, o, o + run, src(i))
        i += 1; o += run
      }
    }
    out
  }

  /** Decode a baseline TIFF payload to the engine's raster form
    * (row-major interleaved, WhiteIsZero normalized to intensity). */
  def decode(payload: Array[Byte]): Png.Image = {
    require(payload != null && payload.length >= 8, "TIFF: payload too short")
    val le =
      if (payload(0) == 'I' && payload(1) == 'I') true
      else if (payload(0) == 'M' && payload(1) == 'M') false
      else throw new IllegalArgumentException("TIFF: bad byte-order mark")
    val rd = new Rd(payload, le)
    require(rd.u16(2) == 42, "TIFF: bad magic (expected 42)")
    val ifdOff = rd.u32(4)
    val n = rd.u16(ifdOff)
    require(n >= 1 && n <= MaxIfdEntries, s"TIFF: IFD entry count $n")
    val tags: Map[Int, Seq[Long]] =
      (0 until n).map(i => entryValues(rd, ifdOff + 2 + 12L * i)).toMap
    def one(tag: Int, default: => Long): Long =
      tags.get(tag).flatMap(_.headOption).getOrElse(default)
    def req(tag: Int, name: String): Seq[Long] =
      tags.getOrElse(tag,
        throw new IllegalArgumentException(s"TIFF: missing $name tag $tag"))

    val width = req(256, "ImageWidth").head
    val height = req(257, "ImageLength").head
    require(width >= 1 && height >= 1 && width <= (1 << 20) &&
      height <= (1 << 20), s"TIFF: bad dimensions ${width}x$height")
    val samples = one(277, 1L).toInt
    val bits = tags.getOrElse(258, Seq(1L))
    val photometric = one(262, -1L).toInt
    val compression = one(259, 1L).toInt
    val planar = one(284, 1L).toInt
    require(planar == 1,
      "TIFF: PlanarConfiguration 2 (planar) not supported — baseline is chunky")
    require(compression == 1 || compression == 5 || compression == 32773,
      s"TIFF: compression $compression not supported (none/LZW/PackBits)")
    val predictor = one(317, 1L).toInt
    val channels = photometric match {
      case 0 | 1 =>
        require(samples == 1, s"TIFF: $samples samples for gray/bilevel")
        require(bits == Seq(1L) || bits == Seq(8L),
          s"TIFF: bits ${bits.mkString(",")} unsupported (1 or 8)")
        1
      case 2 =>
        require(samples == 3, s"TIFF: RGB needs 3 samples, got $samples")
        require(bits == Seq(8L, 8L, 8L),
          s"TIFF: RGB bits ${bits.mkString(",")} unsupported (8,8,8)")
        3
      case p => throw new IllegalArgumentException(
        s"TIFF: photometric $p unsupported (WhiteIsZero/BlackIsZero/RGB)")
    }
    val bitDepth = bits.head.toInt
    require(predictor == 1 || (predictor == 2 && bitDepth == 8),
      s"TIFF: predictor $predictor unsupported (1, or 2 on 8-bit samples)")
    require(width * height * channels <= Png.MaxRasterBytes,
      s"TIFF: raster ${width}x$height x$channels over cap")

    val w = width.toInt; val h = height.toInt
    val pixels = new Array[Byte](w * h * channels)

    /** Decompress one segment (strip or tile) and blit its
      * `rows`×`cols` pixel region into the raster at (y0, x0). A
      * segment row is `segRowBytes` wide (tiles pad edges to the full
      * tile width; the blit copies only the in-image columns). */
    def blit(raw: Array[Byte], segRowBytes: Int, segRows: Int,
             y0: Int, x0: Int, rows: Int, cols: Int, label: String): Unit = {
      val expected = segRows * segRowBytes
      val data = compression match {
        case 32773 => packBitsDecode(raw, expected)
        case 5 => lzwDecode(raw, expected)
        case _ =>
          require(raw.length >= expected,
            s"TIFF: $label has ${raw.length} bytes, needs $expected")
          raw
      }
      if (predictor == 2) undiffRows(data, segRows, segRowBytes, samples)
      var r = 0
      while (r < rows) {
        if (bitDepth == 8) {
          val src = r * segRowBytes
          val dst = ((y0 + r) * w + x0) * channels
          System.arraycopy(data, src, pixels, dst, cols * channels)
          if (photometric == 0) { // WhiteIsZero: normalize to intensity
            var i = dst
            while (i < dst + cols * channels) {
              pixels(i) = (255 - (pixels(i) & 0xff)).toByte; i += 1
            }
          }
        } else { // bilevel, MSB-first (FillOrder 1)
          var c = 0
          while (c < cols) {
            val bit = (data(r * segRowBytes + (c >> 3)) >> (7 - (c & 7))) & 1
            val v = if (photometric == 0) (if (bit == 0) 255 else 0)
                    else (if (bit == 1) 255 else 0)
            pixels((y0 + r) * w + x0 + c) = v.toByte
            c += 1
          }
        }
        r += 1
      }
    }

    val tiled = tags.contains(322) || tags.contains(324)
    if (tiled) {
      // §15 tiles: the image is a grid of FULL tw×th tiles (edges
      // padded), row-major, each compressed independently
      val tw = req(322, "TileWidth").head
      val th = req(323, "TileLength").head
      require(tw >= 1 && th >= 1 && tw <= 65536 && th <= 65536,
        s"TIFF: bad tile size ${tw}x$th")
      val across = ((width + tw - 1) / tw).toInt
      val down = ((height + th - 1) / th).toInt
      require(across.toLong * down <= MaxStrips,
        s"TIFF: ${across.toLong * down} tiles over cap")
      val tileRowBytes = ((tw * samples * bitDepth + 7) / 8).toInt
      require(th * tileRowBytes <= Png.MaxRasterBytes,
        "TIFF: tile buffer over cap")
      val offsets = req(324, "TileOffsets")
      val counts = req(325, "TileByteCounts")
      require(offsets.size == across * down && counts.size == across * down,
        s"TIFF: ${across * down} tiles expected, " +
          s"${offsets.size} offsets / ${counts.size} counts")
      var ty = 0
      while (ty < down) {
        var tx = 0
        while (tx < across) {
          val idx = ty * across + tx
          val y0 = ty * th.toInt; val x0 = tx * tw.toInt
          blit(rd.slice(offsets(idx), counts(idx)), tileRowBytes, th.toInt,
            y0, x0, math.min(th.toInt, h - y0), math.min(tw.toInt, w - x0),
            s"tile $idx")
          tx += 1
        }
        ty += 1
      }
      return Png.Image(w, h, channels, pixels)
    }

    val rowsPerStrip = one(278, 0xffffffffL) min height
    val stripOffsets = req(273, "StripOffsets")
    val stripCounts = req(279, "StripByteCounts")
    val nStrips = ((height + rowsPerStrip - 1) / rowsPerStrip).toInt
    require(stripOffsets.size == nStrips && stripCounts.size == nStrips,
      s"TIFF: $nStrips strips expected, " +
        s"${stripOffsets.size} offsets / ${stripCounts.size} counts")

    val rowBytes = ((width * samples * bitDepth + 7) / 8).toInt
    var row = 0
    (0 until nStrips).foreach { s =>
      val rows = math.min(rowsPerStrip, height - s * rowsPerStrip).toInt
      blit(rd.slice(stripOffsets(s), stripCounts(s)), rowBytes, rows,
        row, 0, rows, w, s"strip $s")
      row += rows
    }
    Png.Image(w, h, channels, pixels)
  }

  // ---- fixture encoder -------------------------------------------------

  /** Pixel layouts the fixture encoder writes. */
  sealed trait Mode { def samples: Int; def bits: Seq[Int]; def photometric: Int }
  /** 8-bit grayscale; `whiteIsZero` stores inverted values (the decoder
    * normalizes back, so pixel(r,c) round-trips as written). */
  final case class Gray8(whiteIsZero: Boolean = false) extends Mode {
    val samples = 1; val bits = Seq(8)
    val photometric = if (whiteIsZero) 0 else 1
  }
  final case object Rgb888 extends Mode {
    val samples = 3; val bits = Seq(8, 8, 8); val photometric = 2
  }
  /** 1-bit bilevel; `pixel` values are intensities 0/255 and are mapped
    * to bits per the photometric. */
  final case class Bilevel(whiteIsZero: Boolean = false) extends Mode {
    val samples = 1; val bits = Seq(1)
    val photometric = if (whiteIsZero) 0 else 1
  }

  /** PackBits encoder: runs of >= 2 equal bytes become repeat packets,
    * everything else literal packets (both capped at 128). */
  private[multimodal] def packBitsEncode(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < row.length) {
      var run = 1
      while (i + run < row.length && row(i + run) == row(i) && run < 128)
        run += 1
      if (run >= 2) {
        out.write(1 - run); out.write(row(i)); i += run
      } else {
        var lit = 1
        while (i + lit < row.length && lit < 128 &&
          !(i + lit + 1 < row.length && row(i + lit + 1) == row(i + lit)))
          lit += 1
        out.write(lit - 1)
        out.write(row, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  /** Synthesize a baseline TIFF: `pixel(r, c, k)` returns the intensity
    * (0..255) of sample k. Strips respect `rowsPerStrip`; PackBits
    * compresses each row separately (the spec's row-boundary rule), LZW
    * compresses each segment as one stream; `predictor = 2` stores
    * 8-bit samples horizontally differenced (tag 317). `tile` switches
    * to the §15 tiled layout (tags 322-325; pass multiples of 16 for
    * conformance) — edge tiles are zero-padded to full size. */
  def encode(width: Int, height: Int, mode: Mode, bigEndian: Boolean,
             packBits: Boolean, rowsPerStrip: Int,
             pixel: (Int, Int, Int) => Int,
             lzw: Boolean = false, predictor: Int = 1,
             tile: Option[(Int, Int)] = None): Array[Byte] = {
    require(width >= 1 && height >= 1 && rowsPerStrip >= 1)
    require(!(packBits && lzw), "pick ONE compression")
    require(predictor == 1 || (predictor == 2 && mode.bits.head == 8),
      "predictor 2 needs 8-bit samples")
    val rowBytes = (width * mode.samples * mode.bits.head + 7) / 8
    def rowData(r: Int): Array[Byte] = {
      val row = new Array[Byte](rowBytes)
      if (mode.bits.head == 8) {
        var c = 0
        while (c < width) {
          var k = 0
          while (k < mode.samples) {
            val v = pixel(r, c, k) & 0xff
            row(c * mode.samples + k) =
              (if (mode.photometric == 0) 255 - v else v).toByte
            k += 1
          }
          c += 1
        }
      } else {
        var c = 0
        while (c < width) {
          val intensity = pixel(r, c, 0) & 0xff
          val bit = mode.photometric match {
            case 0 => if (intensity >= 128) 0 else 1 // WhiteIsZero
            case _ => if (intensity >= 128) 1 else 0 // BlackIsZero
          }
          if (bit == 1) row(c >> 3) = (row(c >> 3) | (1 << (7 - (c & 7)))).toByte
          c += 1
        }
      }
      row
    }
    def diffRow(row: Array[Byte]): Array[Byte] = {
      val out = row.clone()
      var i = row.length - 1
      while (i >= mode.samples) {
        out(i) = (row(i) - row(i - mode.samples)).toByte
        i -= 1
      }
      out
    }
    def codeSegment(raw0: Seq[Array[Byte]]): Array[Byte] = {
      val raw = if (predictor == 2) raw0.map(diffRow) else raw0
      if (lzw) lzwEncode(raw.reduce(_ ++ _))
      else if (packBits) raw.map(packBitsEncode).reduce(_ ++ _)
      else raw.reduce(_ ++ _)
    }
    // a tile row reads pixel() inside the image and zero-pads outside
    def tileRow(tw0: Int, y: Int, x0: Int): Array[Byte] = {
      val trb = (tw0 * mode.samples * mode.bits.head + 7) / 8
      val row = new Array[Byte](trb)
      if (y < height) {
        var c = 0
        while (c < tw0 && x0 + c < width) {
          if (mode.bits.head == 8) {
            var k = 0
            while (k < mode.samples) {
              val v = pixel(y, x0 + c, k) & 0xff
              row(c * mode.samples + k) =
                (if (mode.photometric == 0) 255 - v else v).toByte
              k += 1
            }
          } else {
            val intensity = pixel(y, x0 + c, 0) & 0xff
            val bit = mode.photometric match {
              case 0 => if (intensity >= 128) 0 else 1
              case _ => if (intensity >= 128) 1 else 0
            }
            if (bit == 1)
              row(c >> 3) = (row(c >> 3) | (1 << (7 - (c & 7)))).toByte
          }
          c += 1
        }
      }
      row
    }
    val nStrips = tile match {
      case Some((tw0, th0)) =>
        ((width + tw0 - 1) / tw0) * ((height + th0 - 1) / th0)
      case None => (height + rowsPerStrip - 1) / rowsPerStrip
    }
    val strips: Seq[Array[Byte]] = tile match {
      case Some((tw0, th0)) =>
        val across = (width + tw0 - 1) / tw0
        (0 until nStrips).map { idx =>
          val ty = idx / across; val tx = idx % across
          codeSegment((0 until th0).map(r =>
            tileRow(tw0, ty * th0 + r, tx * tw0)))
        }
      case None =>
        (0 until nStrips).map { s =>
          val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
          codeSegment((0 until rows).map(r => rowData(s * rowsPerStrip + r)))
        }
    }

    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) { out.write(v >> 8); out.write(v) }
      else { out.write(v); out.write(v >> 8) }
    def w32(v: Long): Unit =
      if (bigEndian) { out.write((v >> 24).toInt); out.write((v >> 16).toInt)
        out.write((v >> 8).toInt); out.write(v.toInt) }
      else { out.write(v.toInt); out.write((v >> 8).toInt)
        out.write((v >> 16).toInt); out.write((v >> 24).toInt) }

    // layout: header(8) | IFD | [bits array >2 shorts] [strip arrays] | data
    val entries = scala.collection.mutable.ArrayBuffer.empty[
      (Int, Int, Long, Either[Long, Int])] // tag, type, count, inline | arrayId
    // arrayId: 0 = bitsPerSample shorts, 1 = stripOffsets, 2 = stripCounts
    entries += ((256, 4, 1L, Left(width.toLong)))
    entries += ((257, 4, 1L, Left(height.toLong)))
    if (mode.samples == 1)
      entries += ((258, 3, 1L, Left(mode.bits.head.toLong)))
    else entries += ((258, 3, 3L, Right(0)))
    entries += ((259, 3, 1L,
      Left(if (lzw) 5L else if (packBits) 32773L else 1L)))
    entries += ((262, 3, 1L, Left(mode.photometric.toLong)))
    val (offTag, cntTag) = if (tile.isDefined) (324, 325) else (273, 279)
    if (nStrips == 1) entries += ((offTag, 4, 1L, Left(-1L))) // patched below
    else entries += ((offTag, 4, nStrips.toLong, Right(1)))
    entries += ((277, 3, 1L, Left(mode.samples.toLong)))
    if (predictor == 2) entries += ((317, 3, 1L, Left(2L)))
    tile match {
      case Some((tw0, th0)) =>
        entries += ((322, 4, 1L, Left(tw0.toLong)))
        entries += ((323, 4, 1L, Left(th0.toLong)))
      case None =>
        entries += ((278, 4, 1L, Left(rowsPerStrip.toLong)))
    }
    if (nStrips == 1)
      entries += ((cntTag, 4, 1L, Left(strips.head.length.toLong)))
    else entries += ((cntTag, 4, nStrips.toLong, Right(2)))

    val ifdSize = 2 + entries.size * 12 + 4
    var cursor = 8L + ifdSize
    val bitsArrOff = cursor
    if (mode.samples == 3) cursor += 6
    val stripOffArr = cursor
    if (nStrips > 1) cursor += 4L * nStrips
    val stripCntArr = cursor
    if (nStrips > 1) cursor += 4L * nStrips
    val dataStart = cursor
    val stripStarts = strips.scanLeft(dataStart)(_ + _.length).init

    val mark = if (bigEndian) 'M' else 'I'
    out.write(mark); out.write(mark)
    w16(42)
    w32(8L)
    w16(entries.size)
    entries.sortBy(_._1).foreach { case (tag, typ, count, v) =>
      w16(tag); w16(typ); w32(count)
      v match {
        case Left(inline) =>
          val patched =
            if ((tag == 273 || tag == 324) && inline == -1L) dataStart
            else inline
          if (typ == 3) { w16(patched.toInt); w16(0) } else w32(patched)
        case Right(0) => w32(bitsArrOff)
        case Right(1) => w32(stripOffArr)
        case Right(_) => w32(stripCntArr)
      }
    }
    w32(0L) // no next IFD
    if (mode.samples == 3) { w16(8); w16(8); w16(8) }
    if (nStrips > 1) {
      stripStarts.foreach(w32)
      strips.foreach(s => w32(s.length.toLong))
    }
    strips.foreach(out.write)
    out.toByteArray
  }
}
