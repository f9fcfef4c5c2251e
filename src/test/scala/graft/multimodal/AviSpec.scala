package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class AviSpec extends AnyFunSuite {

  private def randomVideo(rnd: scala.util.Random, w: Int, h: Int,
                          nf: Int): Avi.Video =
    Avi.Video(w, h, Array.fill(nf) {
      val f = new Array[Byte](w * h * 3); rnd.nextBytes(f); f
    })

  test("decode inverts encode exactly — including non-multiple-of-4 rows") {
    val rnd = new scala.util.Random(7)
    // w=5 gives rowSize 16 (15+pad), w=2 gives 8 (6+pad): padding exercised
    for ((w, h, nf) <- Seq((1, 1, 1), (5, 3, 2), (2, 4, 3), (8, 6, 4))) {
      val v = randomVideo(rnd, w, h, nf)
      val back = Avi.decode(Avi.encode(v))
      assert(back.width === w && back.height === h)
      assert(back.frames.length === nf)
      back.frames.zip(v.frames).foreach { case (a, b) =>
        assert(a.toSeq === b.toSeq)
      }
    }
  }

  test("row padding bytes are ignored, bottom-up rows are flipped") {
    // 2x2 single frame with distinct corner colors: raster is
    // [TL, TR, BL, BR] each (r,g,b); encode stores BR-row-first as BGR
    val px = Array[Byte](
      10, 11, 12,  20, 21, 22,   // top row:    TL TR
      30, 31, 32,  40, 41, 42)   // bottom row: BL BR
    val bytes = Avi.encode(Avi.Video(2, 2, Array(px)))
    // find the movi frame chunk and check the first stored row is the
    // BOTTOM image row in BGR order (32,31,30 then 42,41,40)
    val s = bytes.indexOfSlice(Seq[Byte]('0', '0', 'd', 'b'))
    assert(s > 0)
    val body = s + 8
    assert(bytes.slice(body, body + 6).toSeq ===
      Seq[Byte](32, 31, 30, 42, 41, 40))
    // rowSize(2) = 8: two pad bytes close each row
    assert(Avi.rowSize(2) === 8)
    val back = Avi.decode(bytes)
    assert(back.frames(0).toSeq === px.toSeq)
  }

  test("top-down (negative biHeight) rasters decode without the flip") {
    val px = Array[Byte](1, 2, 3, 4, 5, 6) // 1x2: top (1,2,3), bottom (4,5,6)
    val bytes = Avi.encode(Avi.Video(1, 2, Array(px)))
    // locate strf's BITMAPINFOHEADER and negate biHeight; the stored
    // raster is bottom-up, so a top-down reader must see flipped rows
    val strf = bytes.indexOfSlice(Seq[Byte]('s', 't', 'r', 'f'))
    val bih = strf + 8
    val negH = -2
    (0 until 4).foreach(i => bytes(bih + 8 + i) = ((negH >> (8 * i)) & 0xff).toByte)
    val back = Avi.decode(bytes)
    assert(back.frames(0).toSeq === Seq[Byte](4, 5, 6, 1, 2, 3))
  }

  test("ancillary chunks (JUNK, idx1) are walked over") {
    val rnd = new scala.util.Random(11)
    val v = randomVideo(rnd, 3, 2, 2)
    val clean = Avi.encode(v)
    // splice an odd-length JUNK chunk right after the hdrl LIST; patch
    // the RIFF size so the container stays conformant
    val hdrlEnd = {
      val p = clean.indexOfSlice(Seq[Byte]('h', 'd', 'r', 'l'))
      val listLen = (clean(p - 8 + 4) & 0xff) | ((clean(p - 8 + 5) & 0xff) << 8) |
        ((clean(p - 8 + 6) & 0xff) << 16) | ((clean(p - 8 + 7) & 0xff) << 24)
      p - 8 + 8 + listLen
    }
    val junk = Array[Byte]('J', 'U', 'N', 'K', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = clean.take(hdrlEnd) ++ junk ++ clean.drop(hdrlEnd)
    val riffLen = (spliced.length - 8).toLong
    (0 until 4).foreach(i => spliced(4 + i) = ((riffLen >> (8 * i)) & 0xff).toByte)
    val back = Avi.decode(spliced)
    assert(back.frames.length === 2)
    back.frames.zip(v.frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("property: decode∘encode is identity over random videos") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val genVideo = for {
      w <- Gen.choose(1, 16)
      h <- Gen.choose(1, 16)
      nf <- Gen.choose(1, 5)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield randomVideo(new scala.util.Random(seed), w, h, nf)
    val prop = Prop.forAll(genVideo) { v =>
      val back = Avi.decode(Avi.encode(v))
      back.width == v.width && back.height == v.height &&
        back.frames.length == v.frames.length &&
        back.frames.zip(v.frames).forall { case (a, b) => a.sameElements(b) }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("MJPEG AVI: per-frame baseline JPEG decode, gray expanded to RGB") {
    // DC-only JPEG frames -> closed-form flat-per-block pixels; the MJPG
    // path must route each 00dc chunk through Jpeg.decode and expand
    // grayscale rasters to the Video RGB shape
    val w = 24; val h = 16; val q = 16
    val jpegs = Array.tabulate(3) { fi =>
      Jpeg.encodeDcOnly(w, h,
        Seq(Jpeg.DcComp(1, 1, 0, 0, 0, (bR, bC) => fi * 4 + bR * 2 + bC + 1)),
        Map(0 -> Array.fill(64)(q)))
    }
    val v = Avi.decode(Avi.encodeMjpeg(w, h, jpegs))
    assert(v.width === w && v.height === h && v.frames.length === 3)
    for (fi <- 0 until 3; y <- 0 until h; x <- 0 until w) {
      val want = Jpeg.dcOnlyPixel(((fi * 4 + (y / 8) * 2 + x / 8 + 1) * q))
      val d = (y * w + x) * 3
      val f = v.frames(fi)
      assert((f(d) & 0xff) === want && (f(d + 1) & 0xff) === want &&
        (f(d + 2) & 0xff) === want, s"frame $fi pixel ($x,$y)")
    }
    // a poison JPEG frame fails the AVI decode (caller maps to ok=false)
    val poison = jpegs.clone(); poison(1) = Array[Byte](1, 2, 3, 4)
    intercept[IllegalArgumentException](
      Avi.decode(Avi.encodeMjpeg(w, h, poison)))
  }

  test("malformed/unsupported input throws, never hangs or allocates wild") {
    val good = Avi.encode(Avi.Video(2, 2, Array(new Array[Byte](12))))
    intercept[IllegalArgumentException](Avi.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](Avi.decode(good.take(40))) // truncated
    // compressed stream (biCompression != 0) rejected
    val comp = good.clone()
    val strf = comp.indexOfSlice(Seq[Byte]('s', 't', 'r', 'f'))
    comp(strf + 8 + 16) = 1
    intercept[IllegalArgumentException](Avi.decode(comp))
    // 8-bit palette rejected
    val pal = good.clone()
    pal(strf + 8 + 14) = 8
    intercept[IllegalArgumentException](Avi.decode(pal))
    // poison dims: header claims 2^30 x 2^30 — must throw BEFORE any
    // frame-size allocation (the Png ADVICE lesson)
    val huge = good.clone()
    val dim = 1 << 30
    (0 until 4).foreach { i =>
      huge(strf + 8 + 4 + i) = ((dim >> (8 * i)) & 0xff).toByte
      huge(strf + 8 + 8 + i) = ((dim >> (8 * i)) & 0xff).toByte
    }
    intercept[IllegalArgumentException](Avi.decode(huge))
    // frame chunk whose length disagrees with the header dims
    val short = good.clone()
    val db = short.indexOfSlice(Seq[Byte]('0', '0', 'd', 'b'))
    short(db + 4) = 4
    intercept[IllegalArgumentException](Avi.decode(short))
  }
}
