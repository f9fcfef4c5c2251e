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
  *     equality. Grayscale only: for color ImageIO's writer subsamples
  *     chroma and its fancy (interpolating) upsampler diverges from this
  *     decoder's contractual replication upsampling by design.
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
    // progressive rejected with a clear message
    val prog = ok.clone()
    prog(sof + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e.getMessage.contains("progressive"))
  }
}
