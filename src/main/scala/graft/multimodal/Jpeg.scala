package graft.multimodal

/** Pure-JVM baseline JPEG (JFIF/T.81) decoder — a REAL pixel decoder (not
  * a stub): the full marker walk (DQT/DHT/SOF0/DRI/SOS, APPn/COM skipped),
  * canonical Huffman entropy decoding with byte-unstuffing and restart
  * markers, dequantization, an integer inverse DCT, sampling-factor
  * chroma upsampling, and fixed-point YCbCr→RGB conversion. Baseline
  * sequential JPEG is a public-spec, dependency-free algorithm — unlike
  * perceptual codecs (H.264/Opus) it needs no codec library, which is why
  * web-crawl image ingestion (overwhelmingly JPEG) belongs on the real
  * path next to [[Png]].
  *
  * SCOPE: baseline + extended-sequential Huffman (SOF0/SOF1) AND
  * progressive Huffman (SOF2 — spectral selection + successive
  * approximation per T.81 §G: multi-scan coefficient accumulation, DC
  * first/refinement scans, AC band scans with EOB-run coding, AC
  * refinement with interleaved correction bits), 8-bit precision, 1
  * component (grayscale) or 3 components (YCbCr), sampling factors 1..4
  * with replication upsampling, restart intervals in both sequential and
  * progressive scans. Arithmetic coding, hierarchical (SOF5..7/13..15),
  * 12-bit precision, and CMYK throw with a clear message — the decode
  * operator maps that to an `ok=false` row, never a task failure.
  * Progressive matters at crawl scale: a large share of web JPEGs are
  * progressive, and "needs a codec library" never excused SOF2 — it is
  * the same public T.81 chapter as baseline.
  *
  * DETERMINISM CONTRACT (what an external oracle can replay exactly):
  *  - IDCT: a two-pass separable integer transform over a 13-bit scaled
  *    cosine table `C13(u)(x) = round(s(u)·cos((2x+1)uπ/16)·8192)`,
  *    s(0)=1/√8, s(u)=1/2. Pass 1 descales by `(acc + 1024) >> 11`,
  *    pass 2 by `(acc + 16384) >> 15`, then +128 level shift and clamp.
  *    For a DC-only block every pixel is exactly
  *    `clamp(128 + ((2896·((2896·d + 1024) >> 11) + 16384) >> 15))`
  *    with `d` the dequantized DC — pure integer arithmetic an oracle
  *    replays in SQL (q108).
  *  - Upsampling: pure replication — chroma sample at
  *    `(x·h/hMax, y·v/vMax)` (floor).
  *  - Color: libjpeg-style 16-bit fixed point, half-up —
  *    `r = y + ((91881·cr' + 32768) >> 16)`,
  *    `g = y - ((22554·cb' + 46802·cr' + 32768) >> 16)`,
  *    `b = y + ((116130·cb' + 32768) >> 16)` with cb'/cr' centered at 0,
  *    each clamped to [0, 255].
  * `JpegSpec` cross-checks general decode against the JDK's ImageIO
  * reader (an independent libjpeg-lineage implementation; IDCTs may
  * legally differ by ±1-2 per pixel) and the DC-only path bit-exactly.
  *
  * The matching [[encodeDcOnly]] synthesizes spec-conformant DC-only
  * fixtures COEFFICIENT-side (no forward DCT — the encoder writes chosen
  * quantized coefficients directly), so fixture pixels follow the closed
  * form above and every stage the decoder runs — table parse, canonical
  * Huffman decode, DC prediction (and its restart-marker reset),
  * dequantization, IDCT, upsampling, color conversion — is verified
  * end-to-end by arithmetic an external engine recomputes.
  *
  * Reference behavior modeled on the image-bytes columns of
  * /root/reference/data_processing (multimodal payload plumbing); the
  * codec itself follows the public T.81/JFIF spec only.
  */
object Jpeg {

  /** Same hard allocation ceiling as [[Png.MaxRasterBytes]]: header-driven
    * allocations (component planes + output raster) must stay bounded no
    * matter what a crafted SOF claims. */
  val MaxRasterBytes: Long = Png.MaxRasterBytes

  // zigzag scan position -> natural (row-major) coefficient index, T.81 §A.3.6
  private[multimodal] val NaturalOrder: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** 13-bit scaled IDCT cosine table (see determinism contract). */
  private val C13: Array[Array[Int]] = Array.tabulate(8, 8) { (u, x) =>
    val s = if (u == 0) 1.0 / math.sqrt(8.0) else 0.5
    math.round(s * math.cos((2 * x + 1) * u * math.Pi / 16.0) * 8192.0).toInt
  }

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Canonical Huffman decode table (T.81 F.2.2.3): per code length
    * 1..16, the smallest/largest code and the index of its first value. */
  private final class Huff(counts: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1); k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
      require(k == vals.length, "DHT counts/values mismatch")
    }
    def value(l: Int, code: Int): Int = vals(valPtr(l) + code - minCode(l))
  }

  /** Entropy-segment bit reader: byte-stuffing (FF 00 -> FF datum),
    * restart-marker alignment, hard failure on truncation or a stray
    * marker mid-data (a crafted payload must throw, never spin). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) fill()
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) { v = (v << 1) | bit(); i += 1 }
      v
    }
    private def fill(): Unit = {
      require(pos < b.length, "truncated entropy-coded data")
      var v = b(pos) & 0xff; pos += 1
      if (v == 0xff) {
        require(pos < b.length, "truncated entropy-coded data after 0xFF")
        val m = b(pos) & 0xff
        if (m == 0x00) pos += 1
        else throw new IllegalArgumentException(
          f"marker 0xFF$m%02X inside entropy-coded data")
      }
      buf = v; cnt = 8
    }
    def expectRst(n: Int): Unit = {
      cnt = 0 // byte-align, discard pad bits
      require(pos + 2 <= b.length, "truncated at restart marker")
      val ok = (b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) == (0xd0 + n)
      require(ok, f"expected RST$n%d, got 0x${b(pos)}%02X${b(pos + 1)}%02X")
      pos += 2
    }
  }

  /** T.81 EXTEND (F.2.2.1): map an s-bit magnitude code to its signed
    * coefficient value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Decode a baseline JPEG byte array to its raw pixel raster (gray:
    * 1 channel; color: interleaved RGB). Throws IllegalArgumentException
    * on malformed/unsupported input — a decode operator maps that to a
    * null row, never a task failure. */
  def decode(jpeg: Array[Byte]): Png.Image = {
    require(jpeg.length >= 4 &&
      (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG: bad SOI")
    val qt = new Array[Array[Int]](4)
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var width = -1; var height = -1
    var comps: Array[Comp] = null
    var restartInterval = 0
    var progressive = false
    var pstate: ProgState = null // allocated at the first progressive SOS
    var nScans = 0
    var off = 2
    while (true) {
      require(off + 2 <= jpeg.length, "truncated JPEG: no SOS before EOF")
      require((jpeg(off) & 0xff) == 0xff, f"expected marker at $off%d")
      var m = jpeg(off + 1) & 0xff
      while (m == 0xff) { // fill bytes
        off += 1
        require(off + 2 <= jpeg.length, "truncated JPEG in fill bytes")
        m = jpeg(off + 1) & 0xff
      }
      off += 2
      m match {
        case 0xd9 => // EOI: ends a progressive frame; invalid before any scan
          if (pstate != null && nScans > 0)
            return finishProgressive(pstate, comps, qt, width, height)
          throw new IllegalArgumentException("EOI before any scan")
        case 0xd8 =>
          throw new IllegalArgumentException("unexpected second SOI")
        case 0x01 => () // TEM, standalone
        case rst if rst >= 0xd0 && rst <= 0xd7 =>
          throw new IllegalArgumentException("stray RST marker outside scan")
        case _ =>
          require(off + 2 <= jpeg.length, "truncated marker segment")
          val len = u16(jpeg, off)
          require(len >= 2 && off + len <= jpeg.length,
            f"truncated segment for marker 0xFF$m%02X")
          val body = off + 2
          val end = off + len
          m match {
            case 0xdb => // DQT — one or more tables
              var p = body
              while (p < end) {
                val pq = (jpeg(p) & 0xff) >> 4
                val tq = jpeg(p) & 0x0f
                require(pq == 0, "16-bit quant tables unsupported (8-bit only)")
                require(p + 65 <= end, "truncated DQT")
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) { t(i) = jpeg(p + 1 + i) & 0xff; i += 1 }
                qt(tq) = t // zigzag order, as stored
                p += 65
              }
            case 0xc4 => // DHT — one or more tables
              var p = body
              while (p < end) {
                require(p + 17 <= end, "truncated DHT")
                val tc = (jpeg(p) & 0xff) >> 4
                val th = jpeg(p) & 0x0f
                require(tc <= 1, s"bad DHT class $tc")
                val counts = new Array[Int](16)
                var n = 0
                var i = 0
                while (i < 16) { counts(i) = jpeg(p + 1 + i) & 0xff; n += counts(i); i += 1 }
                require(n <= 256 && p + 17 + n <= end, "truncated DHT values")
                val vals = new Array[Int](n)
                i = 0
                while (i < n) { vals(i) = jpeg(p + 17 + i) & 0xff; i += 1 }
                val h = new Huff(counts, vals)
                if (tc == 0) dcTab(th) = h else acTab(th) = h
                p += 17 + n
              }
            case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 sequential, SOF2 progressive
              require(comps == null, "multiple SOF segments")
              require(len >= 8, "SOF too short")
              progressive = m == 0xc2
              val prec = jpeg(body) & 0xff
              require(prec == 8, s"precision $prec unsupported (8-bit only)")
              height = u16(jpeg, body + 1)
              width = u16(jpeg, body + 3)
              val nc = jpeg(body + 5) & 0xff
              require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
              require(nc == 1 || nc == 3,
                s"$nc components unsupported (grayscale or YCbCr only)")
              require(len == 8 + 3 * nc, "SOF length mismatch")
              comps = Array.tabulate(nc) { i =>
                val p = body + 6 + 3 * i
                val id = jpeg(p) & 0xff
                val hh = (jpeg(p + 1) & 0xff) >> 4
                val vv = jpeg(p + 1) & 0x0f
                val tq = jpeg(p + 2) & 0xff
                require(hh >= 1 && hh <= 4 && vv >= 1 && vv <= 4,
                  s"sampling ${hh}x$vv out of range")
                require(tq <= 3, s"bad quant table id $tq")
                Comp(id, hh, vv, tq)
              }
            case sof if sof >= 0xc3 && sof <= 0xcf && sof != 0xc8 && sof != 0xcc =>
              throw new IllegalArgumentException(
                f"SOF 0xFF$sof%02X unsupported — sequential/progressive " +
                  "Huffman only")
            case 0xdd =>
              require(len == 4, "bad DRI length")
              restartInterval = u16(jpeg, body)
            case 0xda if !progressive => // sequential SOS — decode and return
              require(comps != null, "SOS before SOF")
              val ns = jpeg(body) & 0xff
              require(ns == comps.length,
                s"scan has $ns components, frame has ${comps.length} " +
                  "(multi-scan sequential files unsupported)")
              require(len == 6 + 2 * ns, "SOS length mismatch")
              val scanDc = new Array[Huff](ns)
              val scanAc = new Array[Huff](ns)
              var i = 0
              while (i < ns) {
                val cs = jpeg(body + 1 + 2 * i) & 0xff
                val td = (jpeg(body + 2 + 2 * i) & 0xff) >> 4
                val ta = jpeg(body + 2 + 2 * i) & 0x0f
                val ci = comps.indexWhere(_.id == cs)
                require(ci == i, s"scan component order mismatch (id $cs)")
                require(td <= 3 && ta <= 3, "bad Huffman table id")
                scanDc(i) = dcTab(td); scanAc(i) = acTab(ta)
                require(scanDc(i) != null && scanAc(i) != null,
                  s"scan references missing Huffman table ($td/$ta)")
                i += 1
              }
              comps.foreach(c => require(qt(c.tq) != null,
                s"missing quant table ${c.tq}"))
              return decodeScan(jpeg, end, width, height, comps,
                scanDc, scanAc, qt, restartInterval)
            case 0xda => // progressive SOS — accumulate coefficients
              require(comps != null, "SOS before SOF")
              if (pstate == null)
                pstate = ProgState.init(width, height, comps)
              nScans += 1
              require(nScans <= 256, "more than 256 scans (crafted input?)")
              val ns = jpeg(body) & 0xff
              require(ns >= 1 && ns <= comps.length, s"bad scan count $ns")
              require(len == 6 + 2 * ns, "SOS length mismatch")
              val scanCi = new Array[Int](ns)
              val scanDc = new Array[Huff](ns)
              val scanAc = new Array[Huff](ns)
              var i = 0
              while (i < ns) {
                val cs = jpeg(body + 1 + 2 * i) & 0xff
                val td = (jpeg(body + 2 + 2 * i) & 0xff) >> 4
                val ta = jpeg(body + 2 + 2 * i) & 0x0f
                val ci = comps.indexWhere(_.id == cs)
                require(ci >= 0, s"scan references unknown component id $cs")
                require(i == 0 || ci > scanCi(i - 1),
                  "scan components out of frame order")
                require(td <= 3 && ta <= 3, "bad Huffman table id")
                scanCi(i) = ci
                scanDc(i) = dcTab(td)
                scanAc(i) = acTab(ta)
                i += 1
              }
              val ss = jpeg(body + 1 + 2 * ns) & 0xff
              val se = jpeg(body + 2 + 2 * ns) & 0xff
              val ah = (jpeg(body + 3 + 2 * ns) & 0xff) >> 4
              val al = jpeg(body + 3 + 2 * ns) & 0x0f
              off = decodeProgressiveScan(jpeg, end, pstate, scanCi,
                scanDc, scanAc, ss, se, ah, al, restartInterval)
            case _ => () // APPn, COM, ancillary — skipped
          }
          if (m != 0xda) off = end
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Integer IDCT per the determinism contract; `coef` natural order
    * (already dequantized), `out` row-major spatial [0,255]. */
  private def idct(coef: Array[Int], tmp: Array[Int], out: Array[Int]): Unit = {
    var u = 0
    while (u < 8) { // pass 1: one coefficient column -> spatial rows
      var y = 0
      while (y < 8) {
        var acc = 0L
        var v = 0
        while (v < 8) { acc += C13(v)(y).toLong * coef(v * 8 + u); v += 1 }
        tmp(y * 8 + u) = ((acc + 1024L) >> 11).toInt
        y += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) { // pass 2: rows
      var x = 0
      while (x < 8) {
        var acc = 0L
        var u2 = 0
        while (u2 < 8) { acc += C13(u2)(x).toLong * tmp(y * 8 + u2); u2 += 1 }
        var p = (((acc + 16384L) >> 15) + 128L).toInt
        if (p < 0) p = 0 else if (p > 255) p = 255
        out(y * 8 + x) = p
        x += 1
      }
      y += 1
    }
  }

  private def decodeScan(b: Array[Byte], dataOff: Int, width: Int,
                         height: Int, comps: Array[Comp],
                         scanDc: Array[Huff], scanAc: Array[Huff],
                         qt: Array[Array[Int]],
                         restartInterval: Int): Png.Image = {
    val nc = comps.length
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    // Single-component scans are never interleaved (T.81 A.2.2): the MCU
    // is one block and sampling factors don't enter the geometry.
    val (mcusX, mcusY, effH, effV) =
      if (nc == 1) ((width + 7) / 8, (height + 7) / 8, Array(1), Array(1))
      else (
        (width + 8 * hMax - 1) / (8 * hMax),
        (height + 8 * vMax - 1) / (8 * vMax),
        comps.map(_.h), comps.map(_.v))
    // All header-driven allocations bounded BEFORE any new Array (the Png
    // poison lesson): component planes plus the output raster.
    var planeBytes = 0L
    val planeW = new Array[Int](nc)
    val planeH = new Array[Int](nc)
    var ci = 0
    while (ci < nc) {
      planeW(ci) = Math.multiplyExact(mcusX * effH(ci), 8)
      planeH(ci) = Math.multiplyExact(mcusY * effV(ci), 8)
      planeBytes += Math.multiplyExact(planeW(ci).toLong, planeH(ci).toLong)
      ci += 1
    }
    val outBytes = Math.multiplyExact(
      Math.multiplyExact(width.toLong, height.toLong),
      (if (nc == 1) 1 else 3).toLong)
    require(planeBytes + outBytes <= MaxRasterBytes,
      s"raster ${width}x$height ($planeBytes + $outBytes bytes) exceeds " +
        s"$MaxRasterBytes-byte cap")
    val planes = Array.tabulate(nc)(i => new Array[Byte](planeW(i) * planeH(i)))
    val pred = new Array[Int](nc)
    val coef = new Array[Int](64)
    val tmp = new Array[Int](64)
    val px = new Array[Int](64)
    val reader = new BitReader(b, dataOff)
    var rstIdx = 0
    var mcu = 0
    val nMcus = mcusX.toLong * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        reader.expectRst(rstIdx)
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      val mx = (mcu % mcusX).toInt
      val my = (mcu / mcusX).toInt
      ci = 0
      while (ci < nc) {
        val q = qt(comps(ci).tq)
        var v0 = 0
        while (v0 < effV(ci)) {
          var h0 = 0
          while (h0 < effH(ci)) {
            // ---- one 8x8 block (T.81 F.2.2) ----
            java.util.Arrays.fill(coef, 0)
            val t = huffDecode(reader, scanDc(ci))
            require(t <= 15, s"bad DC category $t")
            pred(ci) += extend(reader.receive(t), t)
            coef(0) = pred(ci) * q(0)
            var k = 1
            while (k < 64) {
              val rs = huffDecode(reader, scanAc(ci))
              val r = rs >> 4
              val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += r
                require(k < 64, "AC coefficient index overflow")
                coef(NaturalOrder(k)) = extend(reader.receive(s), s) * q(k)
                k += 1
              }
            }
            idct(coef, tmp, px)
            // place into the component plane
            val bx = (mx * effH(ci) + h0) * 8
            val by = (my * effV(ci) + v0) * 8
            val stride = planeW(ci)
            val plane = planes(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              val rowBase = (by + yy) * stride + bx
              while (xx < 8) {
                plane(rowBase + xx) = px(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            h0 += 1
          }
          v0 += 1
        }
        ci += 1
      }
      mcu += 1
    }
    assemble(planes, planeW, comps, width, height, hMax, vMax)
  }

  /** Crop component planes, upsample chroma by replication, convert
    * color — shared by the sequential and progressive paths (the two
    * differ only in how the planes are filled). */
  private def assemble(planes: Array[Array[Byte]], planeW: Array[Int],
                       comps: Array[Comp], width: Int, height: Int,
                       hMax: Int, vMax: Int): Png.Image = {
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      val stride = planeW(0)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * stride, out, y * width, width)
        y += 1
      }
      Png.Image(width, height, 1, out)
    } else {
      val out = new Array[Byte](width * height * 3)
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < height) {
        val yRow = (y * cy.v / vMax) * planeW(0)
        val bRow = (y * cb.v / vMax) * planeW(1)
        val rRow = (y * cr.v / vMax) * planeW(2)
        var x = 0
        while (x < width) {
          val yv = planes(0)(yRow + x * cy.h / hMax) & 0xff
          val cbC = (planes(1)(bRow + x * cb.h / hMax) & 0xff) - 128
          val crC = (planes(2)(rRow + x * cr.h / hMax) & 0xff) - 128
          var r = yv + ((91881 * crC + 32768) >> 16)
          var g = yv - ((22554 * cbC + 46802 * crC + 32768) >> 16)
          var bl = yv + ((116130 * cbC + 32768) >> 16)
          if (r < 0) r = 0 else if (r > 255) r = 255
          if (g < 0) g = 0 else if (g > 255) g = 255
          if (bl < 0) bl = 0 else if (bl > 255) bl = 255
          val d = (y * width + x) * 3
          out(d) = r.toByte; out(d + 1) = g.toByte; out(d + 2) = bl.toByte
          x += 1
        }
        y += 1
      }
      Png.Image(width, height, 3, out)
    }
  }

  // =========================================================================
  // Progressive (SOF2) decoding — T.81 §G.2
  // =========================================================================

  /** Frame-lifetime progressive state: per-component quantized-coefficient
    * arrays (natural order within each 64-slot block), MCU geometry for
    * interleaved DC scans, and the per-component block grids for
    * non-interleaved scans (T.81 A.2.2: ceil(compSamples/8), NOT the
    * MCU-padded count — padding blocks are coded only in interleaved
    * scans). */
  private final class ProgState(
      val mcusX: Int, val mcusY: Int,
      val effH: Array[Int], val effV: Array[Int],
      val blocksW: Array[Int], val blocksH: Array[Int],
      val compBW: Array[Int], val compBH: Array[Int],
      val coef: Array[Array[Int]])

  private object ProgState {
    def init(width: Int, height: Int, comps: Array[Comp]): ProgState = {
      val nc = comps.length
      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      val (mcusX, mcusY, effH, effV) =
        if (nc == 1) ((width + 7) / 8, (height + 7) / 8, Array(1), Array(1))
        else (
          (width + 8 * hMax - 1) / (8 * hMax),
          (height + 8 * vMax - 1) / (8 * vMax),
          comps.map(_.h), comps.map(_.v))
      val blocksW = Array.tabulate(nc)(i => mcusX * effH(i))
      val blocksH = Array.tabulate(nc)(i => mcusY * effV(i))
      val compBW = Array.tabulate(nc) { i =>
        if (nc == 1) blocksW(0)
        else ((width * comps(i).h + hMax - 1) / hMax + 7) / 8
      }
      val compBH = Array.tabulate(nc) { i =>
        if (nc == 1) blocksH(0)
        else ((height * comps(i).v + vMax - 1) / vMax + 7) / 8
      }
      // header-driven allocation cap (the Png poison lesson): planes +
      // 4-byte-per-sample coefficient arrays + output raster
      var planeBytes = 0L
      var i = 0
      while (i < nc) {
        planeBytes += Math.multiplyExact(
          Math.multiplyExact(blocksW(i).toLong, blocksH(i).toLong), 64L)
        i += 1
      }
      val outBytes = Math.multiplyExact(
        Math.multiplyExact(width.toLong, height.toLong),
        (if (nc == 1) 1 else 3).toLong)
      require(planeBytes * 5 + outBytes <= MaxRasterBytes,
        s"progressive raster ${width}x$height (${planeBytes * 5} + " +
          s"$outBytes bytes) exceeds $MaxRasterBytes-byte cap")
      val coef = Array.tabulate(nc)(i =>
        new Array[Int](blocksW(i) * blocksH(i) * 64))
      new ProgState(mcusX, mcusY, effH, effV, blocksW, blocksH,
        compBW, compBH, coef)
    }
  }

  /** Decode one progressive scan's entropy data, accumulating into
    * `st.coef`; returns the byte offset just past the scan's data (the
    * next marker). Implements T.81 G.2: DC first/refinement bands, AC
    * first bands with EOB-run coding, AC refinement with correction bits
    * interleaved into symbol runs and EOB sweeps. */
  private def decodeProgressiveScan(b: Array[Byte], dataOff: Int,
      st: ProgState, scanCi: Array[Int], scanDc: Array[Huff],
      scanAc: Array[Huff], ss: Int, se: Int, ah: Int, al: Int,
      restartInterval: Int): Int = {
    val ns = scanCi.length
    require(ss >= 0 && se <= 63 && ss <= se, s"bad spectral band $ss..$se")
    if (ns > 1) require(ss == 0,
      "interleaved progressive scans must be DC scans")
    val dcScan = ss == 0
    if (dcScan) require(se == 0, "DC scan must have Se=0")
    else require(ns == 1, "AC scans are single-component")
    require(ah == 0 || al == ah - 1,
      s"bad successive approximation Ah=$ah Al=$al")
    require(al <= 13, s"point transform $al out of range")
    if (dcScan && ah == 0)
      scanDc.foreach(t => require(t != null,
        "scan references missing DC Huffman table"))
    if (!dcScan && ah == 0)
      require(scanAc(0) != null, "scan references missing AC Huffman table")
    // AC refinement also Huffman-decodes symbols
    if (!dcScan && ah > 0)
      require(scanAc(0) != null, "scan references missing AC Huffman table")
    val reader = new BitReader(b, dataOff)
    val pred = new Array[Int](ns)
    var eobrun = 0L
    val p1 = 1 << al
    val m1 = -1 << al

    def dcFirst(si: Int, coefA: Array[Int], base: Int): Unit = {
      val t = huffDecode(reader, scanDc(si))
      require(t <= 15, s"bad DC category $t")
      pred(si) += extend(reader.receive(t), t)
      coefA(base) = pred(si) << al
    }
    def dcRefine(coefA: Array[Int], base: Int): Unit =
      if (reader.bit() == 1) coefA(base) |= p1

    def acFirst(coefA: Array[Int], base: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = huffDecode(reader, scanAc(0))
        val r = rs >> 4
        val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1L << r) - 1
            if (r > 0) eobrun += reader.receive(r)
            k = 64 // block ends here
          }
        } else {
          k += r
          require(k <= se, "AC index overflow in progressive band")
          coefA(base + NaturalOrder(k)) = extend(reader.receive(s), s) << al
          k += 1
        }
      }
    }

    /** One refinement correction bit at band position k (history
      * nonzero): a 1-bit moves the coefficient one step away from zero
      * at this precision if that bit isn't set yet. */
    def correct(coefA: Array[Int], idx: Int): Unit =
      if (reader.bit() == 1 && (coefA(idx) & p1) == 0)
        coefA(idx) += (if (coefA(idx) >= 0) p1 else m1)

    def acRefine(coefA: Array[Int], base: Int): Unit = {
      var k = ss
      if (eobrun == 0) {
        var ended = false
        while (k <= se && !ended) {
          val rs = huffDecode(reader, scanAc(0))
          var r = rs >> 4
          val s = rs & 0x0f
          var newVal = 0
          if (s == 0) {
            if (r < 15) {
              eobrun = 1L << r
              if (r > 0) eobrun += reader.receive(r)
              ended = true // remainder of band handled by the EOB sweep
            } // else ZRL: skip 16 zero-history coefficients
          } else {
            require(s == 1, s"refinement magnitude category $s != 1")
            newVal = if (reader.bit() == 1) p1 else m1
          }
          if (!ended) {
            // advance over r zero-history coefficients, correcting
            // nonzero-history ones passed along the way
            var advancing = true
            while (advancing && k <= se) {
              val idx = base + NaturalOrder(k)
              if (coefA(idx) != 0) correct(coefA, idx)
              else {
                if (r == 0) advancing = false
                else { r -= 1 }
              }
              if (advancing) k += 1
            }
            if (newVal != 0) {
              require(k <= se, "refinement placement past band end")
              coefA(base + NaturalOrder(k)) = newVal
            }
            k += 1
          }
        }
      }
      if (eobrun > 0) {
        // EOB sweep: correction bits for the nonzero-history remainder
        while (k <= se) {
          val idx = base + NaturalOrder(k)
          if (coefA(idx) != 0) correct(coefA, idx)
          k += 1
        }
        eobrun -= 1
      }
    }

    def codeBlock(si: Int, ci: Int, bR: Int, bC: Int): Unit = {
      val base = (bR * st.blocksW(ci) + bC) * 64
      val coefA = st.coef(ci)
      if (dcScan) {
        if (ah == 0) dcFirst(si, coefA, base) else dcRefine(coefA, base)
      } else {
        if (ah == 0) acFirst(coefA, base) else acRefine(coefA, base)
      }
    }

    var rstIdx = 0
    var unit = 0L
    val nUnits: Long =
      if (ns > 1) st.mcusX.toLong * st.mcusY
      else st.compBW(scanCi(0)).toLong * st.compBH(scanCi(0))
    while (unit < nUnits) {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        reader.expectRst(rstIdx)
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }
      if (ns > 1) { // interleaved DC scan: MCU geometry
        val mx = (unit % st.mcusX).toInt
        val my = (unit / st.mcusX).toInt
        var si = 0
        while (si < ns) {
          val ci = scanCi(si)
          var v0 = 0
          while (v0 < st.effV(ci)) {
            var h0 = 0
            while (h0 < st.effH(ci)) {
              codeBlock(si, ci, my * st.effV(ci) + v0, mx * st.effH(ci) + h0)
              h0 += 1
            }
            v0 += 1
          }
          si += 1
        }
      } else { // non-interleaved: the component's own block grid
        val ci = scanCi(0)
        val bW = st.compBW(ci)
        codeBlock(0, ci, (unit / bW).toInt, (unit % bW).toInt)
      }
      unit += 1
    }
    // tolerate a trailing stuffed FF 00 the bit consumer didn't need —
    // the marker walk must resume at a real marker
    var p = reader.pos
    while (p + 1 < b.length && (b(p) & 0xff) == 0xff &&
      (b(p + 1) & 0xff) == 0x00) p += 2
    p
  }

  /** After EOI: dequantize every accumulated block, IDCT into component
    * planes, and run the shared assembly. */
  private def finishProgressive(st: ProgState, comps: Array[Comp],
      qt: Array[Array[Int]], width: Int, height: Int): Png.Image = {
    val nc = comps.length
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    comps.foreach(c => require(qt(c.tq) != null,
      s"missing quant table ${c.tq}"))
    val planeW = Array.tabulate(nc)(i => st.blocksW(i) * 8)
    val planeH = Array.tabulate(nc)(i => st.blocksH(i) * 8)
    val planes = Array.tabulate(nc)(i => new Array[Byte](planeW(i) * planeH(i)))
    val deq = new Array[Int](64)
    val tmp = new Array[Int](64)
    val px = new Array[Int](64)
    var ci = 0
    while (ci < nc) {
      val q = qt(comps(ci).tq)
      val coefA = st.coef(ci)
      val bW = st.blocksW(ci)
      val bH = st.blocksH(ci)
      val stride = planeW(ci)
      val plane = planes(ci)
      var bR = 0
      while (bR < bH) {
        var bC = 0
        while (bC < bW) {
          val base = (bR * bW + bC) * 64
          var k = 0
          while (k < 64) {
            deq(NaturalOrder(k)) = coefA(base + NaturalOrder(k)) * q(k)
            k += 1
          }
          idct(deq, tmp, px)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            val rowBase = (bR * 8 + yy) * stride + bC * 8
            while (xx < 8) {
              plane(rowBase + xx) = px(yy * 8 + xx).toByte
              xx += 1
            }
            yy += 1
          }
          bC += 1
        }
        bR += 1
      }
      ci += 1
    }
    assemble(planes, planeW, comps, width, height, hMax, vMax)
  }

  private def huffDecode(r: BitReader, h: Huff): Int = {
    var code = r.bit()
    var l = 1
    while (code > h.maxCode(l)) {
      require(l < 16, "invalid Huffman code (no match within 16 bits)")
      code = (code << 1) | r.bit()
      l += 1
    }
    h.value(l, code)
  }

  // =========================================================================
  // Fixture encoder: DC-only, coefficient-domain
  // =========================================================================

  /** One frame component of a [[encodeDcOnly]] fixture: sampling factors,
    * quant/Huffman table ids, and the quantized DC coefficient for each
    * (blockRow, blockCol) — including padding blocks of partial MCUs. */
  final case class DcComp(h: Int, v: Int, tq: Int, td: Int, ta: Int,
                          dc: (Int, Int) => Int)

  /** Canonical Huffman ENCODE table from (BITS, HUFFVAL). */
  private final class HuffEnc(counts: Array[Int], vals: Array[Int]) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        var i = 0
        while (i < counts(l - 1)) {
          codeOf(vals(k)) = code; lenOf(vals(k)) = l
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy bit writer with byte stuffing; final byte padded with 1s. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) flushByte()
        i -= 1
      }
    }
    private def flushByte(): Unit = {
      out.write(buf & 0xff)
      if ((buf & 0xff) == 0xff) out.write(0x00) // stuffing
      buf = 0; cnt = 0
    }
    def pad(): Unit = if (cnt > 0) { // 1-bit padding per T.81 F.1.2.3
      while (cnt < 8) { buf = (buf << 1) | 1; cnt += 1 }
      flushByte()
    }
  }

  /** Minimal spec-conformant Huffman tables for the fixture encoder (any
    * valid DHT works — the decoder reads whatever the file declares):
    * DC: categories 0..11 as 4-bit codes (0000..1011; 1111 stays unused,
    * keeping the all-ones code reserved). AC for DC-only streams: EOB and
    * ZRL as 2-bit codes. AC for general coefficients: every RRRRSSSS
    * symbol — 255 of them as 9-bit codes plus the last (0xFF, never
    * emitted) at 10 bits, because a DHT count is one BYTE and a single
    * length cannot hold all 256; the split keeps the table canonical
    * and the all-ones code unused. Wasteful on the wire, trivially
    * canonical, and the decoder exercises the same table-build path
    * either way. */
  private val FixtureDcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val FixtureDcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val FixtureAcBits = Array(0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val FixtureAcVals = Array(0x00, 0xf0)
  private val FlatAcBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0)
  private val FlatAcVals: Array[Int] = Array.tabulate(256)(identity)

  /** Encode a DC-only baseline JPEG from chosen quantized coefficients:
    * SOI, DQT (each distinct tq), DHT (each distinct td/ta, fixture
    * tables), optional DRI, SOF0, SOS, entropy-coded DC-only blocks with
    * restart markers, EOI. `quant` maps table id -> 64 zigzag-order
    * entries. Components: 1 (grayscale) or 3 (YCbCr). */
  def encodeDcOnly(width: Int, height: Int, comps: Seq[DcComp],
                   quant: Map[Int, Array[Int]],
                   restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "bad dimensions")
    require(comps.size == 1 || comps.size == 3, "1 or 3 components")
    comps.foreach { c =>
      require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4, "bad sampling")
      require(quant.contains(c.tq), s"missing quant table ${c.tq}")
    }
    quant.values.foreach(q => require(q.length == 64 &&
      q.forall(v => v >= 1 && v <= 255), "quant entries must be 1..255"))
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(v => out.write(v & 0xff))
    }
    marker(0xd8) // SOI
    quant.toSeq.sortBy(_._1).foreach { case (tq, q) =>
      seg(0xdb, Array(tq) ++ q)
    }
    val nc = comps.size
    seg(0xc0, Array(8, (height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff, nc) ++
      comps.zipWithIndex.flatMap { case (c, i) =>
        Seq(i + 1, (c.h << 4) | c.v, c.tq)
      })
    val dcEnc = new HuffEnc(FixtureDcBits, FixtureDcVals)
    val acEnc = new HuffEnc(FixtureAcBits, FixtureAcVals)
    comps.map(_.td).distinct.sorted.foreach { td =>
      seg(0xc4, Array(td) ++ FixtureDcBits ++ FixtureDcVals)
    }
    comps.map(_.ta).distinct.sorted.foreach { ta =>
      seg(0xc4, Array(0x10 | ta) ++ FixtureAcBits ++ FixtureAcVals)
    }
    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    seg(0xda, Array(nc) ++
      comps.zipWithIndex.flatMap { case (c, i) =>
        Seq(i + 1, (c.td << 4) | c.ta)
      } ++ Seq(0, 63, 0))
    // entropy-coded data — geometry mirrors the decoder exactly
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val (mcusX, mcusY, effH, effV) =
      if (nc == 1) ((width + 7) / 8, (height + 7) / 8, Array(1), Array(1))
      else (
        (width + 8 * hMax - 1) / (8 * hMax),
        (height + 8 * vMax - 1) / (8 * vMax),
        comps.map(_.h).toArray, comps.map(_.v).toArray)
    val w = new BitWriter(out)
    val pred = new Array[Int](nc)
    var rstIdx = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        w.pad()
        marker(0xd0 + rstIdx)
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < nc) {
        val c = comps(ci)
        var v0 = 0
        while (v0 < effV(ci)) {
          var h0 = 0
          while (h0 < effH(ci)) {
            val dc = c.dc(my * effV(ci) + v0, mx * effH(ci) + h0)
            // |dc| <= 1023 keeps every DIFF within category 11, the
            // largest symbol in the fixture DC table
            require(dc >= -1023 && dc <= 1023, s"DC $dc out of fixture range")
            val diff = dc - pred(ci)
            pred(ci) = dc
            val s = 32 - Integer.numberOfLeadingZeros(diff.abs)
            w.put(dcEnc.codeOf(s), dcEnc.lenOf(s))
            if (s > 0)
              w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
            w.put(acEnc.codeOf(0x00), acEnc.lenOf(0x00)) // EOB
            h0 += 1
          }
          v0 += 1
        }
        ci += 1
      }
      mcu += 1
    }
    w.pad()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** One frame component of an [[encodeCoeffs]] fixture: sampling
    * factors, table ids, and the full 64-entry ZIGZAG-order quantized
    * coefficient block for each (blockRow, blockCol). */
  final case class CoefComp(h: Int, v: Int, tq: Int, td: Int, ta: Int,
                            coef: (Int, Int) => Array[Int])

  /** General coefficient-domain baseline encoder — [[encodeDcOnly]]'s big
    * sibling for cross-decoder testing: arbitrary quantized coefficients
    * per block (so the full AC run-length/ZRL/EOB grammar, every DC/AC
    * magnitude category, and the complete IDCT are exercised), encoded
    * with the flat 9-bit AC table. `JpegSpec` uses this to compare
    * [[decode]] against the JDK ImageIO reader on random-coefficient
    * images — something a forward-DCT encoder could not do exactly
    * (there would be no ground truth for what the coefficients ARE). */
  def encodeCoeffs(width: Int, height: Int, comps: Seq[CoefComp],
                   quant: Map[Int, Array[Int]],
                   restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "bad dimensions")
    require(comps.size == 1 || comps.size == 3, "1 or 3 components")
    comps.foreach { c =>
      require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4, "bad sampling")
      require(quant.contains(c.tq), s"missing quant table ${c.tq}")
    }
    quant.values.foreach(q => require(q.length == 64 &&
      q.forall(v => v >= 1 && v <= 255), "quant entries must be 1..255"))
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(v => out.write(v & 0xff))
    }
    marker(0xd8)
    quant.toSeq.sortBy(_._1).foreach { case (tq, q) => seg(0xdb, Array(tq) ++ q) }
    val nc = comps.size
    seg(0xc0, Array(8, (height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff, nc) ++
      comps.zipWithIndex.flatMap { case (c, i) =>
        Seq(i + 1, (c.h << 4) | c.v, c.tq)
      })
    val dcEnc = new HuffEnc(FixtureDcBits, FixtureDcVals)
    val acEnc = new HuffEnc(FlatAcBits, FlatAcVals)
    comps.map(_.td).distinct.sorted.foreach { td =>
      seg(0xc4, Array(td) ++ FixtureDcBits ++ FixtureDcVals)
    }
    comps.map(_.ta).distinct.sorted.foreach { ta =>
      seg(0xc4, Array(0x10 | ta) ++ FlatAcBits ++ FlatAcVals)
    }
    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    seg(0xda, Array(nc) ++
      comps.zipWithIndex.flatMap { case (c, i) =>
        Seq(i + 1, (c.td << 4) | c.ta)
      } ++ Seq(0, 63, 0))
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val (mcusX, mcusY, effH, effV) =
      if (nc == 1) ((width + 7) / 8, (height + 7) / 8, Array(1), Array(1))
      else (
        (width + 8 * hMax - 1) / (8 * hMax),
        (height + 8 * vMax - 1) / (8 * vMax),
        comps.map(_.h).toArray, comps.map(_.v).toArray)
    val w = new BitWriter(out)
    val pred = new Array[Int](nc)
    def cat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v.abs)
    def putMag(v: Int, s: Int): Unit =
      if (s > 0) w.put(if (v < 0) v + (1 << s) - 1 else v, s)
    var rstIdx = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        w.pad(); marker(0xd0 + rstIdx)
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < nc) {
        val c = comps(ci)
        var v0 = 0
        while (v0 < effV(ci)) {
          var h0 = 0
          while (h0 < effH(ci)) {
            val blk = c.coef(my * effV(ci) + v0, mx * effH(ci) + h0)
            require(blk.length == 64, "coefficient block must have 64 entries")
            val dc = blk(0)
            require(dc >= -1023 && dc <= 1023, s"DC $dc out of fixture range")
            val diff = dc - pred(ci)
            pred(ci) = dc
            val s = cat(diff)
            w.put(dcEnc.codeOf(s), dcEnc.lenOf(s))
            putMag(diff, s)
            // AC: zigzag run-length per T.81 F.1.2.2
            var run = 0
            var k = 1
            while (k < 64) {
              val v = blk(k)
              if (v == 0) run += 1
              else {
                require(v >= -1023 && v <= 1023, s"AC $v out of range")
                while (run > 15) {
                  w.put(acEnc.codeOf(0xf0), acEnc.lenOf(0xf0)); run -= 16
                }
                val sa = cat(v)
                val rs = (run << 4) | sa
                w.put(acEnc.codeOf(rs), acEnc.lenOf(rs))
                putMag(v, sa)
                run = 0
              }
              k += 1
            }
            if (run > 0) w.put(acEnc.codeOf(0x00), acEnc.lenOf(0x00)) // EOB
            h0 += 1
          }
          v0 += 1
        }
        ci += 1
      }
      mcu += 1
    }
    w.pad()
    marker(0xd9)
    out.toByteArray
  }

  /** One progressive scan of an [[encodeProgressive]] script: the frame
    * component indices it codes (must be in frame order; >1 only for DC
    * scans), the spectral band [ss, se], and the successive-approximation
    * pair (ah, al). A well-formed script codes each (component, band)
    * first with ah=0 at some al, then refines al-1 … 0 one bit per scan
    * with ah = previous al — the caller owns that discipline (the decoder
    * accumulates whatever the script says; an inconsistent script yields
    * wrong coefficients, not a crash). */
  final case class ProgScan(compIdx: Seq[Int], ss: Int, se: Int,
                            ah: Int, al: Int)

  /** The standard 10-scan script libjpeg-style encoders emit for a
    * 3-component frame: DC first at Al=1 + refinement, then per-component
    * AC bands [1,5]/[6,63] at Al=2→1→0. */
  def standardScript(nc: Int): Seq[ProgScan] =
    if (nc == 1) Seq(
      ProgScan(Seq(0), 0, 0, 0, 1), ProgScan(Seq(0), 1, 5, 0, 2),
      ProgScan(Seq(0), 6, 63, 0, 2), ProgScan(Seq(0), 1, 63, 2, 1),
      ProgScan(Seq(0), 0, 0, 1, 0), ProgScan(Seq(0), 1, 63, 1, 0))
    else Seq(
      ProgScan(Seq(0, 1, 2), 0, 0, 0, 1),
      ProgScan(Seq(0), 1, 5, 0, 2), ProgScan(Seq(2), 1, 63, 0, 1),
      ProgScan(Seq(1), 1, 63, 0, 1), ProgScan(Seq(0), 6, 63, 0, 2),
      ProgScan(Seq(0), 1, 63, 2, 1), ProgScan(Seq(0, 1, 2), 0, 0, 1, 0),
      ProgScan(Seq(2), 1, 63, 1, 0), ProgScan(Seq(1), 1, 63, 1, 0),
      ProgScan(Seq(0), 1, 63, 1, 0))

  /** Progressive (SOF2) coefficient-domain encoder — [[encodeCoeffs]]'s
    * multi-scan sibling: the same chosen quantized coefficients, emitted
    * through an arbitrary spectral-selection / successive-approximation
    * scan script with real EOB-run coding and refinement correction
    * bits. `JpegSpec` decodes the progressive and baseline encodings of
    * the SAME coefficient field and requires bit-identical pixels — the
    * zero-tolerance cross-check no forward-DCT encoder could provide. */
  def encodeProgressive(width: Int, height: Int, comps: Seq[CoefComp],
                        quant: Map[Int, Array[Int]], scans: Seq[ProgScan],
                        restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "bad dimensions")
    require(comps.size == 1 || comps.size == 3, "1 or 3 components")
    require(scans.nonEmpty, "progressive needs at least one scan")
    comps.foreach { c =>
      require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4, "bad sampling")
      require(quant.contains(c.tq), s"missing quant table ${c.tq}")
    }
    quant.values.foreach(q => require(q.length == 64 &&
      q.forall(v => v >= 1 && v <= 255), "quant entries must be 1..255"))
    val nc = comps.size
    scans.foreach { sc =>
      require(sc.compIdx.nonEmpty && sc.compIdx.forall(i => i >= 0 && i < nc)
        && sc.compIdx == sc.compIdx.sorted && sc.compIdx.distinct == sc.compIdx,
        s"bad scan components ${sc.compIdx}")
      require(sc.ss >= 0 && sc.se <= 63 && sc.ss <= sc.se, "bad band")
      if (sc.compIdx.size > 1) require(sc.ss == 0 && sc.se == 0,
        "interleaved scans must be DC-only")
      if (sc.ss == 0) require(sc.se == 0, "DC scan must have Se=0")
      require(sc.ah == 0 || sc.al == sc.ah - 1, "bad Ah/Al chain")
      require(sc.al <= 13, "point transform out of range")
    }
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(v => out.write(v & 0xff))
    }
    marker(0xd8)
    quant.toSeq.sortBy(_._1).foreach { case (tq, q) => seg(0xdb, Array(tq) ++ q) }
    seg(0xc2, Array(8, (height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff, nc) ++
      comps.zipWithIndex.flatMap { case (c, i) =>
        Seq(i + 1, (c.h << 4) | c.v, c.tq)
      })
    val dcEnc = new HuffEnc(FixtureDcBits, FixtureDcVals)
    val acEnc = new HuffEnc(FlatAcBits, FlatAcVals)
    comps.map(_.td).distinct.sorted.foreach { td =>
      seg(0xc4, Array(td) ++ FixtureDcBits ++ FixtureDcVals)
    }
    comps.map(_.ta).distinct.sorted.foreach { ta =>
      seg(0xc4, Array(0x10 | ta) ++ FlatAcBits ++ FlatAcVals)
    }
    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    // geometry — identical formulas to the decoder's ProgState
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val (mcusX, mcusY, effH, effV) =
      if (nc == 1) ((width + 7) / 8, (height + 7) / 8, Array(1), Array(1))
      else (
        (width + 8 * hMax - 1) / (8 * hMax),
        (height + 8 * vMax - 1) / (8 * vMax),
        comps.map(_.h).toArray, comps.map(_.v).toArray)
    val compBW = Array.tabulate(nc) { i =>
      if (nc == 1) mcusX
      else ((width * comps(i).h + hMax - 1) / hMax + 7) / 8
    }
    val compBH = Array.tabulate(nc) { i =>
      if (nc == 1) mcusY
      else ((height * comps(i).v + vMax - 1) / vMax + 7) / 8
    }
    def cat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v.abs)

    scans.foreach { sc =>
      seg(0xda, Array(sc.compIdx.size) ++
        sc.compIdx.flatMap(i =>
          Seq(i + 1, (comps(i).td << 4) | comps(i).ta)) ++
        Seq(sc.ss, sc.se, (sc.ah << 4) | sc.al))
      val w = new BitWriter(out)
      val ns = sc.compIdx.size
      val dcScan = sc.ss == 0
      val pred = new Array[Int](ns)
      // EOB-run state: the run count plus correction bits owed to it
      // (refinement scans buffer a correction bit per nonzero-history
      // coefficient and emit them after the next symbol — cjphuff's
      // BE/BR split, one buffer each here)
      var eobrun = 0
      val eobPending = new scala.collection.mutable.ArrayBuffer[Int]()
      def flushEob(): Unit = if (eobrun > 0) {
        val nbits = 31 - Integer.numberOfLeadingZeros(eobrun)
        w.put(acEnc.codeOf(nbits << 4), acEnc.lenOf(nbits << 4))
        if (nbits > 0) w.put(eobrun & ((1 << nbits) - 1), nbits)
        eobrun = 0
        eobPending.foreach(bit => w.put(bit, 1))
        eobPending.clear()
      }

      def dcFirstBlock(si: Int, dc: Int): Unit = {
        require(dc >= -1023 && dc <= 1023, s"DC $dc out of fixture range")
        val dcv = dc >> sc.al // arithmetic shift = T.81 DC point transform
        val diff = dcv - pred(si)
        pred(si) = dcv
        val s = cat(diff)
        w.put(dcEnc.codeOf(s), dcEnc.lenOf(s))
        if (s > 0) w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      }
      def dcRefineBlock(dc: Int): Unit = w.put((dc >> sc.al) & 1, 1)

      def acFirstBlock(blk: Array[Int]): Unit = {
        var run = 0
        var k = sc.ss
        while (k <= sc.se) {
          val v = blk(k)
          require(v >= -1023 && v <= 1023, s"AC $v out of range")
          val m = v.abs >> sc.al // magnitude truncation toward zero
          if (m == 0) run += 1
          else {
            flushEob()
            while (run > 15) {
              w.put(acEnc.codeOf(0xf0), acEnc.lenOf(0xf0)); run -= 16
            }
            val s = cat(m)
            w.put(acEnc.codeOf((run << 4) | s), acEnc.lenOf((run << 4) | s))
            w.put({ val sv = if (v < 0) -m else m
                    if (sv < 0) sv + (1 << s) - 1 else sv }, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) {
          eobrun += 1
          if (eobrun == 32767) flushEob()
        }
      }

      def acRefineBlock(blk: Array[Int]): Unit = {
        val runPending = new scala.collection.mutable.ArrayBuffer[Int]()
        var eobIdx = sc.ss - 1 // last newly-significant position
        var k = sc.ss
        while (k <= sc.se) {
          if ((blk(k).abs >> sc.al) == 1) eobIdx = k
          k += 1
        }
        var run = 0
        k = sc.ss
        while (k <= sc.se) {
          val v = blk(k)
          val m = v.abs >> sc.al
          if (m == 0) run += 1
          else {
            // ZRLs only before the last newly-significant coefficient;
            // beyond it, runs fold into the EOB
            while (run > 15 && k <= eobIdx) {
              flushEob()
              w.put(acEnc.codeOf(0xf0), acEnc.lenOf(0xf0))
              run -= 16
              runPending.foreach(bit => w.put(bit, 1))
              runPending.clear()
            }
            if (m > 1) runPending += (m & 1) // history nonzero: correction
            else { // newly significant at this precision: magnitude 1
              flushEob()
              w.put(acEnc.codeOf((run << 4) | 1), acEnc.lenOf((run << 4) | 1))
              w.put(if (v < 0) 0 else 1, 1)
              runPending.foreach(bit => w.put(bit, 1))
              runPending.clear()
              run = 0
            }
          }
          k += 1
        }
        if (run > 0 || runPending.nonEmpty) {
          eobrun += 1
          eobPending ++= runPending
          if (eobrun == 32767 || eobPending.size > 900) flushEob()
        }
      }

      def codeBlock(si: Int, ci: Int, bR: Int, bC: Int): Unit = {
        val blk = comps(ci).coef(bR, bC)
        require(blk.length == 64, "coefficient block must have 64 entries")
        if (dcScan) {
          if (sc.ah == 0) dcFirstBlock(si, blk(0)) else dcRefineBlock(blk(0))
        } else {
          if (sc.ah == 0) acFirstBlock(blk) else acRefineBlock(blk)
        }
      }

      var rstIdx = 0
      var unit = 0L
      val nUnits: Long =
        if (ns > 1) mcusX.toLong * mcusY
        else compBW(sc.compIdx.head).toLong * compBH(sc.compIdx.head)
      while (unit < nUnits) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          flushEob()
          w.pad()
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        if (ns > 1) {
          val mx = (unit % mcusX).toInt
          val my = (unit / mcusX).toInt
          var si = 0
          while (si < ns) {
            val ci = sc.compIdx(si)
            var v0 = 0
            while (v0 < effV(ci)) {
              var h0 = 0
              while (h0 < effH(ci)) {
                codeBlock(si, ci, my * effV(ci) + v0, mx * effH(ci) + h0)
                h0 += 1
              }
              v0 += 1
            }
            si += 1
          }
        } else {
          val ci = sc.compIdx.head
          val bW = compBW(ci)
          codeBlock(0, ci, (unit / bW).toInt, (unit % bW).toInt)
        }
        unit += 1
      }
      flushEob()
      w.pad()
    }
    marker(0xd9)
    out.toByteArray
  }

  // =========================================================================
  // EXIF orientation (APP1 / TIFF tag 274)
  // =========================================================================

  /** EXIF orientation from the first APP1 `Exif\0\0` segment: the TIFF
    * 6.0 IFD0 walk to tag 0x0112 (both `II` little- and `MM` big-endian
    * byte orders), values 1..8 per the spec. Returns 0 when the tag is
    * absent or ANY part of the metadata is malformed — orientation is
    * advisory metadata and must never fail a decode pipeline (a crawl
    * pipeline rotates by it at training time; a corrupt EXIF blob just
    * means "unknown", exactly like a missing one). Bounded walk: marker
    * segments are length-delimited and the IFD entry count is capped. */
  def exifOrientation(jpeg: Array[Byte]): Int = {
    if (jpeg.length < 4 ||
      (jpeg(0) & 0xff) != 0xff || (jpeg(1) & 0xff) != 0xd8) return 0
    var off = 2
    while (off + 4 <= jpeg.length && (jpeg(off) & 0xff) == 0xff) {
      val m = jpeg(off + 1) & 0xff
      if (m == 0xd9 || m == 0xda) return 0 // EOI/SOS: no EXIF before image
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) off += 2 // standalone
      else {
        val len = u16(jpeg, off + 2)
        if (len < 2 || off + 2 + len > jpeg.length) return 0
        if (m == 0xe1 && len >= 16 &&
          jpeg(off + 4) == 'E' && jpeg(off + 5) == 'x' &&
          jpeg(off + 6) == 'i' && jpeg(off + 7) == 'f' &&
          jpeg(off + 8) == 0 && jpeg(off + 9) == 0)
          return tiffOrientation(jpeg, off + 10, off + 2 + len)
        off += 2 + len
      }
    }
    0
  }

  private def tiffOrientation(b: Array[Byte], t0: Int, end: Int): Int = {
    if (t0 + 8 > end) return 0
    val le = (b(t0) & 0xff) == 0x49 && (b(t0 + 1) & 0xff) == 0x49
    val be = (b(t0) & 0xff) == 0x4d && (b(t0 + 1) & 0xff) == 0x4d
    if (!le && !be) return 0
    def u16e(i: Int): Int =
      if (i < t0 || i + 2 > end) -1
      else if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32e(i: Int): Long =
      if (i < t0 || i + 4 > end) -1L
      else if (le) u16e(i).toLong | (u16e(i + 2).toLong << 16)
      else (u16e(i).toLong << 16) | u16e(i + 2).toLong
    if (u16e(t0 + 2) != 42) return 0
    val ifd = u32e(t0 + 4)
    if (ifd < 8 || t0 + ifd + 2 > end) return 0
    val p = t0 + ifd.toInt
    val n = u16e(p)
    if (n < 0 || n > 512) return 0
    var i = 0
    while (i < n) {
      val e = p + 2 + 12 * i
      if (u16e(e) == 0x0112) { // orientation; type SHORT, count 1
        if (u16e(e + 2) != 3 || u32e(e + 4) != 1L) return 0
        val v = u16e(e + 8) // value inlined in the 4-byte field
        return if (v >= 1 && v <= 8) v else 0
      }
      i += 1
    }
    0
  }

  /** Fixture APP1 `Exif\0\0` segment carrying ONLY the orientation tag —
    * spliced right after SOI by specs/queries ([[exifOrientation]]'s
    * ground truth; the image decoder skips APPn, so decode output is
    * unchanged by the splice). */
  def exifApp1(orientation: Int, littleEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"bad $orientation")
    def u16b(v: Int): Seq[Int] =
      if (littleEndian) Seq(v & 0xff, (v >> 8) & 0xff)
      else Seq((v >> 8) & 0xff, v & 0xff)
    def u32b(v: Int): Seq[Int] =
      if (littleEndian) Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
      else Seq((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
    val order = if (littleEndian) Seq(0x49, 0x49) else Seq(0x4d, 0x4d)
    val tiff = order ++ u16b(42) ++ u32b(8) ++ // header + IFD0 at offset 8
      u16b(1) ++ // one entry
      (u16b(0x0112) ++ u16b(3) ++ u32b(1) ++ u16b(orientation) ++ Seq(0, 0)) ++
      u32b(0) // no next IFD
    val body = Seq('E'.toInt, 'x'.toInt, 'i'.toInt, 'f'.toInt, 0, 0) ++ tiff
    val len = body.length + 2
    (Seq(0xff, 0xe1, (len >> 8) & 0xff, len & 0xff) ++ body)
      .map(_.toByte).toArray
  }

  /** The DC-only closed-form pixel value (determinism contract) — shared
    * by fixtures, specs, and oracles: `d` is the DEQUANTIZED DC. */
  def dcOnlyPixel(d: Int): Int = {
    val p1 = (2896 * d + 1024) >> 11
    val v = 128 + ((2896 * p1 + 16384) >> 15)
    if (v < 0) 0 else if (v > 255) 255 else v
  }
}
