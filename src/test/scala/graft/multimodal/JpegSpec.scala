package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The baseline JPEG decoder, verified three ways:
  *  1. DC-only fixtures round-trip BIT-EXACTLY to the closed-form pixel
  *     contract ([[Jpeg.dcOnlyPixel]]) across gray / 4:4:4 / 4:2:2 /
  *     4:2:0 geometry, partial MCUs, and restart intervals — the same
  *     arithmetic the q108 oracle replays in SQL.
  *  2. General (all-coefficient) decode cross-checked against the JDK's
  *     ImageIO JPEG reader — an independent libjpeg-lineage decoder.
  *     IDCT implementations may legally differ by a small per-pixel
  *     delta (T.81 places accuracy, not bit-identity, requirements on
  *     the DCT pair), so the assertion is a tight tolerance, not
  *     equality. Two flavors: ImageIO-WRITTEN smooth grayscale (standard
  *     Annex K tables through the full writer pipeline), and
  *     random-COEFFICIENT fixtures via [[Jpeg.encodeCoeffs]] (gray and
  *     color), where both decoders see identical quantized coefficients
  *     — the full AC grammar, ZRL runs, restart intervals, and every
  *     magnitude category, with an exact answer to diff against.
  *     Non-flat chroma rides 4:4:4 only (ImageIO's interpolating
  *     upsampler legitimately differs from contractual replication on
  *     non-constant subsampled planes).
  *  3. Poison inputs fail fast with IllegalArgumentException — never a
  *     hang, never an unbounded allocation.
  */
class JpegSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, dc: (Int, Int) => Int,
                   q: Int = 16, rst: Int = 0): Array[Byte] =
    Jpeg.encodeDcOnly(w, h,
      Seq(Jpeg.DcComp(1, 1, 0, 0, 0, dc)),
      Map(0 -> Array.fill(64)(q)), rst)

  test("DC-only grayscale round-trips to the closed-form contract") {
    val q = 16
    val dc = (bR: Int, bC: Int) => 3 * bR + 5 * bC + 1
    for ((w, h) <- Seq((8, 8), (16, 8), (12, 10), (25, 17))) {
      val img = Jpeg.decode(gray(w, h, dc, q))
      assert(img.width === w && img.height === h && img.channels === 1)
      for (y <- 0 until h; x <- 0 until w) {
        val want = Jpeg.dcOnlyPixel(dc(y / 8, x / 8) * q)
        val got = img.pixels(y * w + x) & 0xff
        assert(got === want, s"(${w}x$h) pixel ($x,$y)")
      }
    }
  }

  test("restart markers reset the DC predictor (decode matches contract)") {
    val q = 24
    val dc = (bR: Int, bC: Int) => (7 * bR + 11 * bC) % 32
    val img = Jpeg.decode(gray(33, 18, dc, q, rst = 2))
    for (y <- 0 until 18; x <- 0 until 33) {
      val want = Jpeg.dcOnlyPixel(dc(y / 8, x / 8) * q)
      assert((img.pixels(y * 33 + x) & 0xff) === want, s"pixel ($x,$y)")
    }
  }

  test("DC-only color round-trips across 4:4:4 / 4:2:2 / 4:2:0") {
    val qY = 16; val qC = 17
    val quant = Map(0 -> Array.fill(64)(qY), 1 -> Array.fill(64)(qC))
    val lumaDc = (bR: Int, bC: Int) => (3 * bR + 5 * bC + 2) % 14
    val cbDc = 3; val crDc = 5
    for ((ch, cv) <- Seq((1, 1), (2, 1), (2, 2)); (w, h) <- Seq((16, 16), (21, 13))) {
      val comps = Seq(
        Jpeg.DcComp(ch, cv, 0, 0, 0, lumaDc),
        Jpeg.DcComp(1, 1, 1, 1, 1, (_, _) => cbDc),
        Jpeg.DcComp(1, 1, 1, 1, 1, (_, _) => crDc))
      val img = Jpeg.decode(Jpeg.encodeDcOnly(w, h, comps, quant))
      assert(img.width === w && img.height === h && img.channels === 3)
      // flat chroma planes -> the color conversion is closed-form too
      val cb = Jpeg.dcOnlyPixel(cbDc * qC) - 128
      val cr = Jpeg.dcOnlyPixel(crDc * qC) - 128
      def clamp(v: Int) = math.max(0, math.min(255, v))
      for (y <- 0 until h; x <- 0 until w) {
        val yv = Jpeg.dcOnlyPixel(lumaDc(y / 8, x / 8) * qY)
        val want = (
          clamp(yv + ((91881 * cr + 32768) >> 16)),
          clamp(yv - ((22554 * cb + 46802 * cr + 32768) >> 16)),
          clamp(yv + ((116130 * cb + 32768) >> 16)))
        val d = (y * w + x) * 3
        val got = (img.pixels(d) & 0xff, img.pixels(d + 1) & 0xff,
          img.pixels(d + 2) & 0xff)
        assert(got === want, s"${ch}x$cv ${w}x$h pixel ($x,$y)")
      }
    }
  }

  test("general decode agrees with the JDK ImageIO reader (grayscale)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val w = 24 + rnd.nextInt(40)
      val h = 16 + rnd.nextInt(40)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      // smooth-ish content plus mild noise: real-image statistics, not
      // adversarial max-magnitude coefficients
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0,
          math.max(0, math.min(255,
            128 + (40 * math.sin(x / 5.0) + 40 * math.cos(y / 7.0)).toInt +
              rnd.nextInt(11) - 5)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos), "ImageIO write")
      val bytes = bos.toByteArray
      val ours = Jpeg.decode(bytes)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ours.width === w && ours.height === h && ours.channels === 1)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs((ours.pixels(y * w + x) & 0xff) -
          ref.getRaster.getSample(x, y, 0))
        if (d > maxDiff) maxDiff = d
      }
      assert(maxDiff <= 2,
        s"trial $trial (${w}x$h): max per-pixel diff $maxDiff vs ImageIO")
    }
  }

  private def refDecode(bytes: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  private def maxChannelDiff(ours: Png.Image,
                             ref: java.awt.image.BufferedImage): Int = {
    // raw raster samples for grayscale: getRGB would push gray through a
    // gray->sRGB ColorSpace conversion (a gamma curve), which compares
    // color management, not the decoder
    val grayRef = ref.getRaster.getNumBands == 1
    var worst = 0
    for (y <- 0 until ours.height; x <- 0 until ours.width) {
      val (rr, rg, rb) =
        if (grayRef) {
          val v = ref.getRaster.getSample(x, y, 0)
          (v, v, v)
        } else {
          val rgb = ref.getRGB(x, y)
          ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        }
      val (or_, og, ob) =
        if (ours.channels == 3) {
          val d = (y * ours.width + x) * 3
          (ours.pixels(d) & 0xff, ours.pixels(d + 1) & 0xff,
            ours.pixels(d + 2) & 0xff)
        } else {
          val v = ours.pixels(y * ours.width + x) & 0xff
          (v, v, v)
        }
      worst = math.max(worst, math.max(math.abs(or_ - rr),
        math.max(math.abs(og - rg), math.abs(ob - rb))))
    }
    worst
  }

  /** Random sparse zigzag coefficient block: DC plus a few AC values,
    * including occasional long zero runs (ZRL) and a tail value. The
    * unclamped IDCT swing is bounded (|f−128| ≤ |dc·q|/8 + 0.25·Σ|ac·q|
    * ≤ 230): libjpeg-lineage reference decoders "clamp" through a
    * range-limit table that only covers moderately out-of-range values
    * and WRAPS beyond it, so a wildly out-of-gamut block would compare
    * clamp-vs-wrap policy instead of decoder-vs-decoder arithmetic. */
  private def randomBlock(rnd: scala.util.Random, q: Array[Int],
                          maxMag: Int): Array[Int] = {
    val blk = new Array[Int](64)
    blk(0) = rnd.nextInt(2 * maxMag + 1) - maxMag
    for (_ <- 0 until rnd.nextInt(8)) {
      val k = 1 + rnd.nextInt(63)
      blk(k) = rnd.nextInt(2 * maxMag + 1) - maxMag
    }
    if (rnd.nextInt(4) == 0) blk(63) = 1 + rnd.nextInt(maxMag) // forces ZRL runs
    def swing: Double = math.abs(blk(0) * q(0)) / 8.0 +
      (1 until 64).map(k => 0.25 * math.abs(blk(k) * q(k))).sum
    while (swing > 230) (0 until 64).foreach(k => blk(k) /= 2)
    blk
  }

  test("random-coefficient decode agrees with ImageIO — grayscale") {
    // coefficient-domain fixtures make ImageIO an exact-input reference:
    // both decoders see the same quantized coefficients, so the only
    // legal divergence is IDCT rounding (T.81 bounds accuracy, not bits)
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 5) {
      val w = 8 + rnd.nextInt(40)
      val h = 8 + rnd.nextInt(40)
      val q = Array.tabulate(64)(i => 1 + rnd.nextInt(if (i == 0) 24 else 40))
      val blocks = scala.collection.mutable.Map.empty[(Int, Int), Array[Int]]
      val bytes = Jpeg.encodeCoeffs(w, h,
        Seq(Jpeg.CoefComp(1, 1, 0, 0, 0, (bR, bC) =>
          blocks.getOrElseUpdate((bR, bC), randomBlock(rnd, q, 60)))),
        Map(0 -> q), restartInterval = if (trial % 2 == 0) 3 else 0)
      val d = maxChannelDiff(Jpeg.decode(bytes), refDecode(bytes))
      assert(d <= 2, s"trial $trial (${w}x$h): max diff $d vs ImageIO")
    }
  }

  test("random-coefficient decode agrees with ImageIO — color") {
    // 4:4:4 runs all three components through full random AC (no
    // upsampling in play); 4:2:0 keeps chroma DC-only, because a FLAT
    // chroma plane upsamples identically under replication and ImageIO's
    // interpolating upsampler — luma still carries full AC. Tolerance 3:
    // IDCT rounding on Y plus chroma rounding through the (shared
    // fixed-point) color convert.
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 4) {
      val w = 8 + rnd.nextInt(32)
      val h = 8 + rnd.nextInt(32)
      val qY = Array.tabulate(64)(i => 1 + rnd.nextInt(if (i == 0) 20 else 32))
      val qC = Array.tabulate(64)(i => 1 + rnd.nextInt(if (i == 0) 20 else 32))
      val is420 = trial % 2 == 0
      val blocks = scala.collection.mutable.Map.empty[(Int, Int, Int), Array[Int]]
      def comp(ci: Int, hh: Int, vv: Int, tq: Int, td: Int, ta: Int,
               chromaFlat: Boolean): Jpeg.CoefComp =
        Jpeg.CoefComp(hh, vv, tq, td, ta, (bR, bC) =>
          // flat chroma must be GLOBALLY flat (one shared block): ImageIO
          // interpolates across chroma-block boundaries, replication
          // doesn't — only a constant plane upsamples identically
          blocks.getOrElseUpdate(
            (ci, if (chromaFlat) 0 else bR, if (chromaFlat) 0 else bC), {
            if (chromaFlat) {
              val b = new Array[Int](64)
              b(0) = rnd.nextInt(9) - 4
              b
            } else randomBlock(rnd, if (tq == 0) qY else qC, 40)
          }))
      val comps =
        if (is420) Seq(comp(0, 2, 2, 0, 0, 0, chromaFlat = false),
          comp(1, 1, 1, 1, 1, 1, chromaFlat = true),
          comp(2, 1, 1, 1, 1, 1, chromaFlat = true))
        else Seq(comp(0, 1, 1, 0, 0, 0, chromaFlat = false),
          comp(1, 1, 1, 1, 1, 1, chromaFlat = false),
          comp(2, 1, 1, 1, 1, 1, chromaFlat = false))
      val bytes = Jpeg.encodeCoeffs(w, h, comps, Map(0 -> qY, 1 -> qC))
      val d = maxChannelDiff(Jpeg.decode(bytes), refDecode(bytes))
      assert(d <= 3,
        s"trial $trial (${w}x$h ${if (is420) "4:2:0" else "4:4:4"}): max diff $d")
    }
  }

  test("poison inputs throw, never hang or over-allocate") {
    def bad(b: Array[Byte]): Unit =
      assertThrows[IllegalArgumentException](Jpeg.decode(b))
    bad(Array[Byte]())                                   // empty
    bad(Array[Byte](0x12, 0x34, 0x56, 0x78))             // not a JPEG
    bad(Array[Byte](0xff.toByte, 0xd8.toByte))           // SOI only
    val ok = gray(16, 16, (_, _) => 5)
    bad(java.util.Arrays.copyOfRange(ok, 0, ok.length / 2)) // truncated scan
    // 64k x 64k claimed dimensions must hit the raster cap, not allocate
    val huge = ok.clone()
    val sof = {
      var i = 2
      var at = -1
      while (at < 0 && i < huge.length - 1) {
        if ((huge(i) & 0xff) == 0xff && (huge(i + 1) & 0xff) == 0xc0) at = i
        i += 1
      }
      at
    }
    assert(sof > 0)
    huge(sof + 5) = 0xff.toByte; huge(sof + 6) = 0xff.toByte // height
    huge(sof + 7) = 0xff.toByte; huge(sof + 8) = 0xff.toByte // width
    bad(huge)
    // flipping SOF0 -> SOF2 on a BASELINE stream is corrupt progressive
    // (its SOS declares band 0..63 in one scan): must throw, not decode
    val prog = ok.clone()
    prog(sof + 1) = 0xc2.toByte
    bad(prog)
    // arithmetic-coded SOF still rejected with a clear message
    val arith = ok.clone()
    arith(sof + 1) = 0xc9.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decode(arith))
    assert(e.getMessage.contains("unsupported"))
  }

  // ======================= progressive (SOF2) ==========================

  test("progressive DC-only matches the closed-form contract (q132 arithmetic)") {
    // DC across three successive-approximation scans (first Al=2, refine
    // 2->1->0) + AC band scans that are pure EOB runs over zero AC — the
    // final DC must reassemble bit-exactly, so pixels follow dcOnlyPixel
    val q = 16
    val dc = (bR: Int, bC: Int) => ((3 * bR + 5 * bC) % 48) - 24
    val script = Seq(
      Jpeg.ProgScan(Seq(0), 0, 0, 0, 2),
      Jpeg.ProgScan(Seq(0), 1, 5, 0, 1),
      Jpeg.ProgScan(Seq(0), 6, 63, 0, 1),
      Jpeg.ProgScan(Seq(0), 0, 0, 2, 1),
      Jpeg.ProgScan(Seq(0), 0, 0, 1, 0),
      Jpeg.ProgScan(Seq(0), 1, 63, 1, 0))
    for ((w, h) <- Seq((8, 8), (16, 8), (25, 17), (41, 33))) {
      val bytes = Jpeg.encodeProgressive(w, h,
        Seq(Jpeg.CoefComp(1, 1, 0, 0, 0, (bR, bC) => {
          val b = new Array[Int](64); b(0) = dc(bR, bC); b
        })),
        Map(0 -> Array.fill(64)(q)), script)
      val img = Jpeg.decode(bytes)
      assert(img.width === w && img.height === h && img.channels === 1)
      for (y <- 0 until h; x <- 0 until w) {
        val want = Jpeg.dcOnlyPixel(dc(y / 8, x / 8) * q)
        assert((img.pixels(y * w + x) & 0xff) === want,
          s"(${w}x$h) pixel ($x,$y)")
      }
    }
  }

  test("progressive == baseline bit-exactly on the same coefficients (gray)") {
    // the two encodings carry the SAME quantized coefficient field; the
    // post-scan pipeline (dequant+IDCT) is shared, so pixels must agree
    // EXACTLY — every progressive path (DC SA chain, AC bands, EOB runs,
    // ZRL, refinement corrections) is covered with zero tolerance
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 6) {
      val w = 8 + rnd.nextInt(48)
      val h = 8 + rnd.nextInt(48)
      val q = Array.tabulate(64)(i => 1 + rnd.nextInt(if (i == 0) 24 else 40))
      val blocks = scala.collection.mutable.Map.empty[(Int, Int), Array[Int]]
      def coef(bR: Int, bC: Int) =
        blocks.getOrElseUpdate((bR, bC), randomBlock(rnd, q, 60))
      val comps = Seq(Jpeg.CoefComp(1, 1, 0, 0, 0, coef))
      val base = Jpeg.decode(Jpeg.encodeCoeffs(w, h, comps, Map(0 -> q)))
      val prog = Jpeg.decode(Jpeg.encodeProgressive(w, h, comps,
        Map(0 -> q), Jpeg.standardScript(1)))
      assert(prog.width === base.width && prog.height === base.height)
      assert(prog.pixels.toSeq === base.pixels.toSeq, s"trial $trial ${w}x$h")
    }
  }

  test("progressive == baseline bit-exactly — color, subsampling, restarts") {
    val rnd = new scala.util.Random(19)
    for (trial <- 0 until 4) {
      val w = 8 + rnd.nextInt(32)
      val h = 8 + rnd.nextInt(32)
      val qY = Array.tabulate(64)(i => 1 + rnd.nextInt(if (i == 0) 20 else 32))
      val qC = Array.tabulate(64)(i => 1 + rnd.nextInt(if (i == 0) 20 else 32))
      val (ch, cv) = Seq((1, 1), (2, 1), (2, 2), (2, 2))(trial)
      val rst = if (trial % 2 == 1) 2 else 0
      val blocks = scala.collection.mutable.Map.empty[(Int, Int, Int), Array[Int]]
      def comp(ci: Int, hh: Int, vv: Int, tq: Int): Jpeg.CoefComp =
        Jpeg.CoefComp(hh, vv, tq, 0, 0, (bR, bC) =>
          blocks.getOrElseUpdate((ci, bR, bC),
            randomBlock(rnd, if (tq == 0) qY else qC, 40)))
      val comps = Seq(comp(0, ch, cv, 0), comp(1, 1, 1, 1), comp(2, 1, 1, 1))
      val base = Jpeg.decode(
        Jpeg.encodeCoeffs(w, h, comps, Map(0 -> qY, 1 -> qC), rst))
      val prog = Jpeg.decode(Jpeg.encodeProgressive(w, h, comps,
        Map(0 -> qY, 1 -> qC), Jpeg.standardScript(3), rst))
      assert(prog.pixels.toSeq === base.pixels.toSeq,
        s"trial $trial ${w}x$h ${ch}x$cv rst=$rst")
    }
  }

  test("progressive EOB-run path: runs span blocks; lone high-k coefs force ZRL") {
    // sparse field: most blocks all-zero AC (EOB runs accumulate across
    // blocks and flush as EOBn symbols with extension bits), every 7th
    // block a lone k=63 coefficient (15-zero ZRL runs in first scans and
    // zero-history skips in refinement)
    val rnd = new scala.util.Random(23)
    val q = Array.fill(64)(8)
    val blocks = scala.collection.mutable.Map.empty[(Int, Int), Array[Int]]
    def coef(bR: Int, bC: Int) = blocks.getOrElseUpdate((bR, bC), {
      val b = new Array[Int](64)
      b(0) = rnd.nextInt(41) - 20
      val n = bR * 13 + bC
      if (n % 7 == 0) b(63) = 5 - (n % 3)   // magnitudes 3..5: refinement bits
      if (n % 11 == 0) b(1) = rnd.nextInt(7) - 3
      b
    })
    val comps = Seq(Jpeg.CoefComp(1, 1, 0, 0, 0, coef))
    val (w, h) = (104, 88) // 13x11 blocks
    val base = Jpeg.decode(Jpeg.encodeCoeffs(w, h, comps, Map(0 -> q)))
    val prog = Jpeg.decode(Jpeg.encodeProgressive(w, h, comps,
      Map(0 -> q), Jpeg.standardScript(1)))
    assert(prog.pixels.toSeq === base.pixels.toSeq)
  }

  test("deep successive-approximation chain (Al 3 -> 0) is bit-exact") {
    // four precision levels on both DC and AC: coefficients become
    // newly-significant at DIFFERENT refinement levels (|v|>>3 == 1 vs
    // later), so multi-level history correction paths all run
    val script = Seq(
      Jpeg.ProgScan(Seq(0), 0, 0, 0, 3),
      Jpeg.ProgScan(Seq(0), 1, 63, 0, 3),
      Jpeg.ProgScan(Seq(0), 0, 0, 3, 2),
      Jpeg.ProgScan(Seq(0), 1, 63, 3, 2),
      Jpeg.ProgScan(Seq(0), 0, 0, 2, 1),
      Jpeg.ProgScan(Seq(0), 1, 63, 2, 1),
      Jpeg.ProgScan(Seq(0), 0, 0, 1, 0),
      Jpeg.ProgScan(Seq(0), 1, 63, 1, 0))
    val rnd = new scala.util.Random(37)
    val q = Array.tabulate(64)(i => 1 + rnd.nextInt(if (i == 0) 24 else 40))
    val blocks = scala.collection.mutable.Map.empty[(Int, Int), Array[Int]]
    def coef(bR: Int, bC: Int) =
      blocks.getOrElseUpdate((bR, bC), randomBlock(rnd, q, 60))
    val comps = Seq(Jpeg.CoefComp(1, 1, 0, 0, 0, coef))
    val (w, h) = (40, 32)
    val base = Jpeg.decode(Jpeg.encodeCoeffs(w, h, comps, Map(0 -> q)))
    val prog = Jpeg.decode(
      Jpeg.encodeProgressive(w, h, comps, Map(0 -> q), script))
    assert(prog.pixels.toSeq === base.pixels.toSeq)
  }

  test("progressive decode agrees with the JDK ImageIO reader") {
    // ImageIO reads progressive JPEG: an independent decoder over OUR
    // progressive encoding of random coefficients (the baseline
    // random-coefficient test's discipline, now through the SOF2 path)
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 3) {
      val w = 16 + rnd.nextInt(32)
      val h = 16 + rnd.nextInt(32)
      val q = Array.tabulate(64)(i => 1 + rnd.nextInt(if (i == 0) 24 else 40))
      val blocks = scala.collection.mutable.Map.empty[(Int, Int), Array[Int]]
      val bytes = Jpeg.encodeProgressive(w, h,
        Seq(Jpeg.CoefComp(1, 1, 0, 0, 0, (bR, bC) =>
          blocks.getOrElseUpdate((bR, bC), randomBlock(rnd, q, 60)))),
        Map(0 -> q), Jpeg.standardScript(1))
      val d = maxChannelDiff(Jpeg.decode(bytes), refDecode(bytes))
      assert(d <= 2, s"trial $trial (${w}x$h): max diff $d vs ImageIO")
    }
  }

  test("progressive fuzz: truncations and byte flips never hang or escape IAE") {
    val rnd = new scala.util.Random(41)
    val q = Array.tabulate(64)(i => 1 + rnd.nextInt(if (i == 0) 24 else 40))
    val blocks = scala.collection.mutable.Map.empty[(Int, Int), Array[Int]]
    val ok = Jpeg.encodeProgressive(33, 25,
      Seq(Jpeg.CoefComp(1, 1, 0, 0, 0, (bR, bC) =>
        blocks.getOrElseUpdate((bR, bC), randomBlock(rnd, q, 60)))),
      Map(0 -> q), Jpeg.standardScript(1), restartInterval = 3)
    // every truncation point: decode must either succeed (truncation
    // landed after the last needed byte) or throw IllegalArgumentException
    var t = 4
    while (t < ok.length) {
      try Jpeg.decode(java.util.Arrays.copyOfRange(ok, 0, t))
      catch { case _: IllegalArgumentException => () }
      t += 17
    }
    // random single-byte corruptions: same contract (IAE or a decode of
    // the corrupt-but-wellformed stream; never a hang/other throwable)
    for (_ <- 0 until 60) {
      val bad = ok.clone()
      val at = 2 + rnd.nextInt(bad.length - 2)
      bad(at) = (bad(at) ^ (1 + rnd.nextInt(255))).toByte
      try Jpeg.decode(bad)
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("exif orientation: both byte orders parse; malformed yields 0, not a throw") {
    val base = gray(16, 16, (_, _) => 5)
    def splice(app1: Array[Byte]) = base.take(2) ++ app1 ++ base.drop(2)
    for (o <- 1 to 8; le <- Seq(true, false)) {
      val j = splice(Jpeg.exifApp1(o, le))
      assert(Jpeg.exifOrientation(j) === o, s"o=$o le=$le")
      // the decoder skips APPn: pixels unchanged by the splice
      assert(Jpeg.decode(j).pixels.toSeq === Jpeg.decode(base).pixels.toSeq)
    }
    assert(Jpeg.exifOrientation(base) === 0) // no EXIF at all
    // corrupt blobs: wrong magic, bad byte order, truncated segment,
    // wild IFD offset — all advisory-metadata failures -> 0
    val good = Jpeg.exifApp1(6, littleEndian = true)
    val wrongMagic = good.clone(); wrongMagic(4) = 'X'.toByte
    assert(Jpeg.exifOrientation(splice(wrongMagic)) === 0)
    val badOrder = good.clone(); badOrder(10) = 0x00
    assert(Jpeg.exifOrientation(splice(badOrder)) === 0)
    val shortSeg = good.clone(); shortSeg(3) = 8 // lies about length
    assert(Jpeg.exifOrientation(splice(shortSeg)) === 0)
    val wildIfd = good.clone(); wildIfd(17) = 0x7f // IFD offset far past end
    assert(Jpeg.exifOrientation(splice(wildIfd)) === 0)
    // fuzz: single-byte corruptions never throw
    val rnd = new scala.util.Random(43)
    val spliced = splice(good)
    for (_ <- 0 until 80) {
      val bad = spliced.clone()
      val at = rnd.nextInt(bad.length)
      bad(at) = (bad(at) ^ (1 + rnd.nextInt(255))).toByte
      val o = Jpeg.exifOrientation(bad)
      assert(o >= 0 && o <= 8)
    }
  }

  test("progressive poison: truncated scans and bad scripts throw") {
    val q = Map(0 -> Array.fill[Int](64)(16))
    val comps = Seq(Jpeg.CoefComp(1, 1, 0, 0, 0, (_, _) => {
      val b = new Array[Int](64); b(0) = 9; b
    }))
    val ok = Jpeg.encodeProgressive(24, 24, comps, q, Jpeg.standardScript(1))
    assert(Jpeg.decode(ok).width === 24)
    assertThrows[IllegalArgumentException](
      Jpeg.decode(java.util.Arrays.copyOfRange(ok, 0, ok.length * 2 / 3)))
    // encoder rejects malformed scripts outright
    assertThrows[IllegalArgumentException](Jpeg.encodeProgressive(8, 8,
      comps, q, Seq(Jpeg.ProgScan(Seq(0), 1, 63, 0, 15)))) // Al too big
    assertThrows[IllegalArgumentException](Jpeg.encodeProgressive(8, 8,
      comps, q, Seq(Jpeg.ProgScan(Seq(0), 0, 63, 0, 0))))  // DC band Se!=0
  }
}
