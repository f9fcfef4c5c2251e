package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class PngSpec extends AnyFunSuite {

  private def randomImage(rnd: scala.util.Random, w: Int, h: Int,
                          c: Int): Png.Image =
    Png.Image(w, h, c, Array.fill(w * h * c)(rnd.nextInt(256).toByte))

  test("decode inverts encode exactly — all channel counts, random pixels") {
    val rnd = new scala.util.Random(42)
    for (c <- Seq(1, 2, 3, 4); (w, h) <- Seq((1, 1), (3, 7), (16, 16), (31, 5))) {
      val img = randomImage(rnd, w, h, c)
      val back = Png.decode(Png.encode(img))
      assert(back.width === w && back.height === h && back.channels === c)
      assert(back.pixels.toSeq === img.pixels.toSeq,
        s"pixel mismatch at w=$w h=$h c=$c")
    }
  }

  test("every filter branch is exercised: heights >= 5 cover filters 0-4") {
    // encode uses filter y%5 — a 10-row image runs each filter twice, and
    // gradient + noise content makes each predictor's delta nontrivial
    val rnd = new scala.util.Random(7)
    val w = 9; val h = 10; val c = 3
    val px = Array.tabulate(w * h * c) { i =>
      ((i % 251) + rnd.nextInt(5)).toByte
    }
    val img = Png.Image(w, h, c, px)
    assert(Png.decode(Png.encode(img)).pixels.toSeq === px.toSeq)
  }

  test("the encoded bytes are a conformant container: sniff + header agree") {
    val img = randomImage(new scala.util.Random(1), 8, 6, 3)
    val bytes = Png.encode(img)
    // PNG signature
    assert((bytes(0) & 0xff) === 0x89 && bytes(1) === 'P'.toByte)
    // IHDR width/height big-endian at offsets 16/20
    def u32(off: Int) = (0 until 4).foldLeft(0)((a, i) => (a << 8) | (bytes(off + i) & 0xff))
    assert(u32(16) === 8 && u32(20) === 6)
  }

  test("property: decode∘encode is identity over random images") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val genImage = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 24)
      c <- Gen.oneOf(1, 2, 3, 4)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield {
      val rnd = new scala.util.Random(seed)
      Png.Image(w, h, c, Array.fill(w * h * c)(rnd.nextInt(256).toByte))
    }
    val prop = Prop.forAll(genImage) { img =>
      val back = Png.decode(Png.encode(img))
      back.width == img.width && back.height == img.height &&
        back.channels == img.channels &&
        java.util.Arrays.equals(back.pixels, img.pixels)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("malformed input throws IllegalArgumentException, never crashes") {
    val good = Png.encode(randomImage(new scala.util.Random(2), 4, 4, 1))
    intercept[IllegalArgumentException](Png.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](Png.decode(good.take(20))) // truncated
    val badMagic = good.clone(); badMagic(0) = 0
    intercept[IllegalArgumentException](Png.decode(badMagic))
    // corrupt IDAT payload (flip bytes mid-stream) -> inflate or length check
    val corrupt = good.clone()
    for (i <- 40 until math.min(48, corrupt.length)) corrupt(i) = 0x55
    intercept[Exception](Png.decode(corrupt))
  }

  // patch big-endian u32 fields inside an encoded PNG (the decoder does not
  // verify chunk CRCs, so a header edit is enough to forge an IHDR)
  private def patch32(png: Array[Byte], off: Int, v: Long): Array[Byte] = {
    val out = png.clone()
    out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
    out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    out
  }

  test("adversarial IHDR dims throw cleanly — no overflow alloc, no OOM") {
    val good = Png.encode(randomImage(new scala.util.Random(3), 4, 4, 1))
    // width/height live at offsets 16/20 (8 sig + 4 len + 4 'IHDR')
    // (a) width*height crosses 2^31: Int math would wrap negative and blow
    //     up as NegativeArraySizeException; Long math must reject it
    val overflow = patch32(patch32(good, 16, 46341L), 20, 46341L)
    val e1 = intercept[IllegalArgumentException](Png.decode(overflow))
    assert(e1.getMessage.contains("cap"), e1.getMessage)
    // (b) huge-but-Int-valid dims: a 100-byte payload must not provoke a
    //     multi-GB allocation before any consistency check
    val huge = patch32(good, 16, 1L << 30)
    val e2 = intercept[IllegalArgumentException](Png.decode(huge))
    assert(e2.getMessage.contains("cap"), e2.getMessage)
  }

  test("FDICT zlib stream throws instead of spinning the inflate loop") {
    // hand-rolled minimal PNG: 1x1 gray IHDR + an IDAT whose zlib header
    // sets the preset-dictionary flag (CMF=0x78 FLG=0x20; (0x7820)%31==0,
    // so Inflater accepts the header, then parks with needsDictionary)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte), 0, 4)
      out.write(ctype.getBytes("US-ASCII"), 0, 4)
      out.write(data, 0, data.length)
      out.write(new Array[Byte](4), 0, 4) // CRC unchecked by the decoder
    }
    chunk("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 8, 0, 0, 0, 0))
    chunk("IDAT", Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0x55, 0x55))
    chunk("IEND", Array.emptyByteArray)
    val e = graft.TestSpark.timed(5000) {
      intercept[IllegalArgumentException](Png.decode(out.toByteArray))
    }
    assert(e.getMessage.toLowerCase.contains("dictionary"), e.getMessage)
  }

  test("decodeImage maps poison payloads to ok=false rows, stats to real ones") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val img = Png.Image(4, 2, 1,
      Array.tabulate(8)(i => (i * 10).toByte)) // 0,10,...,70: mean 35
    val rows = Seq(
      Binary.MediaRow(1L, Png.encode(img), "image", "png"),
      Binary.MediaRow(2L, Array[Byte](9, 9, 9), "image", "png"))
    val out = Binary.decodeImage(rows.toDS()).collect().sortBy(_.media_id)
    assert(out.length === 2)
    assert(out(0).ok && out(0).width === 4 && out(0).height === 2 &&
      out(0).n_px === 8L && out(0).mean_px === 35.0 &&
      out(0).min_px === 0L && out(0).max_px === 70L)
    assert(!out(1).ok && out(1).width === -1)
  }

  test("imageDhash: hand-computed gradient bits, RGB luma, poison row") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // 3x2 grayscale: rows (10, 20, 5) and (7, 7, 9) ->
    // pairs: 10<20 (bit0=1), 20>5 (bit1=0), 7=7 (bit2=0, strict >),
    // 7<9 (bit3=1) -> hash = 0b1001 = 9
    val g = Png.Image(3, 2, 1, Array[Byte](10, 20, 5, 7, 7, 9))
    // 2x1 RGB: luma (299*100+587*50+114*0)/1000 = 59;
    // (299*0+587*0+114*255)/1000 = 29 -> 59 > 29: bit0 = 0 -> hash 0
    val rgb = Png.Image(2, 1, 3,
      Array[Byte](100, 50, 0, 0, 0, 255.toByte))
    val rows = Seq(
      Binary.MediaRow(1L, Png.encode(g), "image", "png"),
      Binary.MediaRow(2L, Png.encode(rgb), "image", "png"),
      Binary.MediaRow(3L, Array[Byte](1, 2, 3), "image", "png"))
    val out = Binary.imageDhash(rows.toDS()).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).ok && out(1L).dhash === 9L)
    assert(out(2L).ok && out(2L).dhash === 0L)
    assert(!out(3L).ok)
  }

  test("imageResize: hand-computed box pooling, uneven boxes, upscale poison") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // 5x4 grayscale, pixel j = j, pooled 2x2. Integer box edges:
    // cols [0,2) and [2,5) (the odd column lands in the right boxes),
    // rows [0,2) and [2,4).
    //   cell(0,0): {0,1,5,6}            sum 12, n 4, avg 3
    //   cell(0,1): {2,3,4,7,8,9}        sum 33, n 6, avg 5
    //   cell(1,0): {10,11,15,16}        sum 52, n 4, avg 13
    //   cell(1,1): {12,13,14,17,18,19}  sum 93, n 6, avg 15 (floor)
    val img = Png.Image(5, 4, 1, Array.tabulate(20)(_.toByte))
    val rows = Seq(
      Binary.MediaRow(1L, Png.encode(img), "image", "png"),
      // 2x2 source into a 3x3 grid would need an empty box: poison row
      Binary.MediaRow(2L, Png.encode(
        Png.Image(2, 2, 1, Array[Byte](1, 2, 3, 4))), "image", "png"),
      Binary.MediaRow(3L, Array[Byte](9, 9), "image", "png"))
    val twoByTwo = Binary.imageResize(
      rows.take(1).toDS(), outW = 2, outH = 2).collect()
      .map(r => (r.oy, r.ox) -> r).toMap
    assert(twoByTwo.size === 4 && twoByTwo.values.forall(_.ok))
    assert(twoByTwo((0, 0)).px_sum === 12L && twoByTwo((0, 0)).px_n === 4L &&
      twoByTwo((0, 0)).px_avg === 3L)
    assert(twoByTwo((0, 1)).px_sum === 33L && twoByTwo((0, 1)).px_n === 6L &&
      twoByTwo((0, 1)).px_avg === 5L)
    assert(twoByTwo((1, 0)).px_sum === 52L && twoByTwo((1, 0)).px_avg === 13L)
    assert(twoByTwo((1, 1)).px_sum === 93L && twoByTwo((1, 1)).px_avg === 15L)
    val threeByThree = Binary.imageResize(
      rows.toDS(), outW = 3, outH = 3).collect()
    assert(threeByThree.count(_.ok) === 9)           // only doc 1 decodes
    assert(threeByThree.filter(!_.ok).map(_.media_id).sorted
      === Array(2L, 3L))
  }

  test("imageDhash is brightness-shift tolerant where mean stats are not") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val base = Array.tabulate(12)(i => (i * 17 % 97).toByte)
    val brighter = base.map(b => ((b & 0xff) + 40).min(255).toByte)
    val rows = Seq(
      Binary.MediaRow(1L, Png.encode(Png.Image(4, 3, 1, base)), "image", "png"),
      Binary.MediaRow(2L, Png.encode(Png.Image(4, 3, 1, brighter)), "image", "png"))
    val out = Binary.imageDhash(rows.toDS()).collect()
      .map(r => r.media_id -> r.dhash).toMap
    // a uniform brightness shift preserves every gradient sign
    assert(out(1L) === out(2L))
  }
}
