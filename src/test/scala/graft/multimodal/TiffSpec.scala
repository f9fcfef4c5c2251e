package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Baseline TIFF codec: encode∘decode round-trips across both byte
  * orders, all three baseline pixel modes, both codings and strip
  * layouts; WhiteIsZero normalizes; poison payloads throw fast. */
class TiffSpec extends AnyFunSuite {

  private def px(id: Int)(r: Int, c: Int, k: Int): Int =
    (id + 3 * r + 5 * c + 11 * k) % 256

  test("gray8 round-trips: byte orders x compression x strip layouts") {
    for {
      be <- Seq(false, true)
      pb <- Seq(false, true)
      rps <- Seq(1, 3, 100) // multi-strip, ragged last strip, single strip
    } {
      val bytes = Tiff.encode(13, 7, Tiff.Gray8(), be, pb, rps, px(5))
      assert(Tiff.isTiff(bytes))
      val img = Tiff.decode(bytes)
      assert(img.width === 13 && img.height === 7 && img.channels === 1)
      for (r <- 0 until 7; c <- 0 until 13)
        assert((img.pixels(r * 13 + c) & 0xff) === px(5)(r, c, 0),
          s"($r,$c) be=$be pb=$pb rps=$rps")
    }
  }

  test("rgb888 round-trips interleaved") {
    for (be <- Seq(false, true); pb <- Seq(false, true)) {
      val img = Tiff.decode(Tiff.encode(9, 5, Tiff.Rgb888, be, pb, 2, px(17)))
      assert(img.channels === 3)
      for (r <- 0 until 5; c <- 0 until 9; k <- 0 until 3)
        assert((img.pixels((r * 9 + c) * 3 + k) & 0xff) === px(17)(r, c, k))
    }
  }

  test("whiteIsZero stores inverted, decodes back to true intensity") {
    val bytes = Tiff.encode(6, 4, Tiff.Gray8(whiteIsZero = true),
      bigEndian = false, packBits = false, rowsPerStrip = 4, px(9))
    val img = Tiff.decode(bytes)
    for (r <- 0 until 4; c <- 0 until 6)
      assert((img.pixels(r * 6 + c) & 0xff) === px(9)(r, c, 0))
    // the stored strip bytes really are inverted (not a no-op pair)
    val stored = bytes.takeRight(24)
    assert(stored.exists(b => (b & 0xff) != px(9)(0, 0, 0)))
  }

  test("bilevel packs MSB-first bits, honors both photometrics") {
    def bit(r: Int, c: Int, k: Int): Int = if ((r + c) % 2 == 0) 255 else 0
    for (wiz <- Seq(false, true); pb <- Seq(false, true)) {
      val img = Tiff.decode(Tiff.encode(11, 6, Tiff.Bilevel(wiz),
        bigEndian = wiz, packBits = pb, rowsPerStrip = 2, bit))
      assert(img.channels === 1)
      for (r <- 0 until 6; c <- 0 until 11)
        assert((img.pixels(r * 11 + c) & 0xff) === bit(r, c, 0),
          s"($r,$c) wiz=$wiz pb=$pb")
    }
  }

  test("lzw round-trips: all modes x byte orders x strips x predictor") {
    for {
      be <- Seq(false, true)
      (mode, pred) <- Seq((Tiff.Gray8(): Tiff.Mode, 2), (Tiff.Rgb888, 2),
        (Tiff.Gray8(whiteIsZero = true), 1), (Tiff.Bilevel(), 1))
      rps <- Seq(2, 100)
    } {
      def pxl(r: Int, c: Int, k: Int): Int =
        if (mode.bits.head == 1) { if ((r + c) % 2 == 0) 255 else 0 }
        else px(31)(r, c, k)
      val img = Tiff.decode(Tiff.encode(21, 11, mode, be,
        packBits = false, rowsPerStrip = rps, pxl,
        lzw = true, predictor = pred))
      for (r <- 0 until 11; c <- 0 until 21; k <- 0 until mode.samples)
        assert((img.pixels((r * 21 + c) * mode.samples + k) & 0xff)
          === pxl(r, c, k), s"($r,$c,$k) be=$be mode=$mode rps=$rps")
    }
  }

  test("lzw codec: random data round-trips across width growth and clears") {
    val rnd = new scala.util.Random(41)
    // random bytes add ~1 table entry each: 8k bytes crosses the 511/
    // 1023/2047 early-change boundaries AND the 4094 clear-reset
    for (n <- Seq(0, 1, 3, 600, 1200, 8192)) {
      val data = Array.fill(n)(rnd.nextInt(256).toByte)
      assert(Tiff.lzwDecode(Tiff.lzwEncode(data), n).toSeq === data.toSeq,
        s"n=$n random")
    }
    // run-heavy data exercises multi-char dictionary hits + KwKwK
    val runs = Array.tabulate(5000)(i => ((i / 37) % 5).toByte)
    assert(Tiff.lzwDecode(Tiff.lzwEncode(runs), runs.length).toSeq
      === runs.toSeq)
    val kwkwk = Array[Byte](1, 1, 1, 1, 1, 1, 1)
    assert(Tiff.lzwDecode(Tiff.lzwEncode(kwkwk), 7).toSeq === kwkwk.toSeq)
    // truncation fails loudly
    val enc = Tiff.lzwEncode(Array.fill(100)(rnd.nextInt(256).toByte))
    intercept[IllegalArgumentException](Tiff.lzwDecode(enc.take(5), 100))
  }

  test("lzw: the JDK ImageIO TIFF reader decodes our encodings identically") {
    // independent-implementation cross-check (the GifSpec discipline):
    // JDK 9+ ships a TIFF plugin; our §13 early-change LZW and §14
    // predictor must interoperate byte-for-byte on decoded pixels
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("tiff")
    assume(readers.hasNext, "no ImageIO TIFF plugin in this JDK")
    for ((lzw, pb, pred) <- Seq((true, false, 1), (true, false, 2),
           (false, true, 1), (false, false, 1))) {
      val bytes = Tiff.encode(19, 13, Tiff.Rgb888, bigEndian = false,
        packBits = pb, rowsPerStrip = 4, px(47), lzw = lzw,
        predictor = pred)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected lzw=$lzw pb=$pb pred=$pred")
      assert(img.getWidth === 19 && img.getHeight === 13)
      for (r <- 0 until 13; c <- 0 until 19) {
        val rgb = img.getRGB(c, r)
        assert(((rgb >> 16) & 0xff) === px(47)(r, c, 0), s"R ($r,$c)")
        assert(((rgb >> 8) & 0xff) === px(47)(r, c, 1), s"G ($r,$c)")
        assert((rgb & 0xff) === px(47)(r, c, 2), s"B ($r,$c)")
      }
    }
  }

  test("tiled layout round-trips: ragged edges, all codings, predictor") {
    // 21x11 with 8x4 tiles -> 3x3 grid, right/bottom tiles zero-padded;
    // the blit must copy only in-image columns/rows
    for {
      be <- Seq(false, true)
      (lzw, pb) <- Seq((false, false), (false, true), (true, false))
      (mode, pred) <- Seq((Tiff.Gray8(): Tiff.Mode, 2), (Tiff.Rgb888, 1),
        (Tiff.Bilevel(), 1))
    } {
      def pxl(r: Int, c: Int, k: Int): Int =
        if (mode.bits.head == 1) { if ((r + c) % 2 == 0) 255 else 0 }
        else px(13)(r, c, k)
      val img = Tiff.decode(Tiff.encode(21, 11, mode, be,
        packBits = pb, rowsPerStrip = 999, pxl, lzw = lzw,
        predictor = if (mode.bits.head == 8) pred else 1,
        tile = Some((8, 4))))
      assert(img.width === 21 && img.height === 11)
      for (r <- 0 until 11; c <- 0 until 21; k <- 0 until mode.samples)
        assert((img.pixels((r * 21 + c) * mode.samples + k) & 0xff)
          === pxl(r, c, k), s"($r,$c,$k) be=$be lzw=$lzw pb=$pb mode=$mode")
    }
    // single-tile image (inline offsets/counts path)
    val one = Tiff.decode(Tiff.encode(6, 5, Tiff.Gray8(), bigEndian = false,
      packBits = false, rowsPerStrip = 999, px(2), tile = Some((8, 8))))
    for (r <- 0 until 5; c <- 0 until 6)
      assert((one.pixels(r * 6 + c) & 0xff) === px(2)(r, c, 0))
  }

  test("tiled lzw: the JDK ImageIO TIFF reader agrees") {
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("tiff")
    assume(readers.hasNext, "no ImageIO TIFF plugin in this JDK")
    // conformant tile sizes are multiples of 16
    val bytes = Tiff.encode(40, 21, Tiff.Rgb888, bigEndian = true,
      packBits = false, rowsPerStrip = 999, px(8), lzw = true,
      predictor = 2, tile = Some((16, 16)))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth === 40 && img.getHeight === 21)
    for (r <- 0 until 21; c <- 0 until 40) {
      val rgb = img.getRGB(c, r)
      assert(((rgb >> 16) & 0xff) === px(8)(r, c, 0), s"R ($r,$c)")
      assert(((rgb >> 8) & 0xff) === px(8)(r, c, 1), s"G ($r,$c)")
      assert((rgb & 0xff) === px(8)(r, c, 2), s"B ($r,$c)")
    }
  }

  test("media_meta reports kind=tiff with dims from either byte order") {
    import org.apache.spark.sql.functions._
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      (1L, Tiff.encode(33, 22, Tiff.Rgb888, bigEndian = false,
        packBits = false, rowsPerStrip = 22, px(3))),
      (2L, Tiff.encode(5, 6, Tiff.Gray8(), bigEndian = true,
        packBits = true, rowsPerStrip = 2, px(4))),
      (3L, Array[Byte]('I', 'I', 42, 0, 9, 9, 9, 9))) // valid mark, junk IFD
      .toDF("id", "payload")
      .select(col("id"), call_function("media_meta", col("payload")).as("m"))
      .select(col("id"), col("m.kind"), col("m.width"), col("m.channels"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    assert(rows === Set((1L, "tiff", 33, 3), (2L, "tiff", 5, 1),
      (3L, "tiff", -1, -1)))
  }

  test("packBits: spec vectors and row round-trips") {
    // repeat packet: -3 means 4 copies
    assert(Tiff.packBitsDecode(Array[Byte](-3, 42), 4).toSeq
      === Seq[Byte](42, 42, 42, 42))
    // literal packet: 2 means copy 3
    assert(Tiff.packBitsDecode(Array[Byte](2, 1, 2, 3), 3).toSeq
      === Seq[Byte](1, 2, 3))
    // -128 is a no-op
    assert(Tiff.packBitsDecode(Array[Byte](-128, 0, 7), 1).toSeq
      === Seq[Byte](7))
    val rnd = new scala.util.Random(3)
    (0 until 50).foreach { i =>
      val row = Array.fill(1 + rnd.nextInt(400))(
        (rnd.nextInt(if (i % 2 == 0) 3 else 256)).toByte) // runs + noise
      val rt = Tiff.packBitsDecode(Tiff.packBitsEncode(row), row.length)
      assert(rt.toSeq === row.toSeq, s"case $i")
    }
    // truncated stream fails loudly, never loops
    intercept[IllegalArgumentException](
      Tiff.packBitsDecode(Array[Byte](5, 1), 6))
  }

  test("poison payloads throw fast: truncation, bad fields, crafted dims") {
    val good = Tiff.encode(8, 8, Tiff.Gray8(), bigEndian = false,
      packBits = false, rowsPerStrip = 8, px(1))
    // every truncation of a valid file must throw, not hang or OOM
    Seq(0, 3, 7, 9, 20, good.length - 1).foreach { n =>
      intercept[IllegalArgumentException](Tiff.decode(good.take(n)))
    }
    intercept[IllegalArgumentException](
      Tiff.decode("NOPE".getBytes ++ good.drop(4)))
    // dimension bomb: width*height over the raster cap must throw BEFORE
    // allocating — flip the width field (offset of tag 256's value)
    val bomb = good.clone()
    val rd = (o: Int) => bomb(o) & 0xff
    // find tag 256 entry: IFD at 8, entries from 10
    val nEnt = rd(8) | (rd(9) << 8)
    val e = (0 until nEnt).map(i => 10 + 12 * i)
      .find(o => (rd(o) | (rd(o + 1) << 8)) == 256).get
    bomb(e + 8) = 0xff.toByte; bomb(e + 9) = 0xff.toByte
    bomb(e + 10) = 0xff.toByte; bomb(e + 11) = 0x7f.toByte
    graft.TestSpark.timed(5000)(
      intercept[IllegalArgumentException](Tiff.decode(bomb)))
  }

  test("byte-flip fuzz: decode() always terminates with decode-or-throw") {
    val base = Tiff.encode(10, 9, Tiff.Rgb888, bigEndian = true,
      packBits = true, rowsPerStrip = 4, px(23))
    val rnd = new scala.util.Random(11)
    graft.TestSpark.timed(30000) {
      (0 until 300).foreach { _ =>
        val b = base.clone()
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        try { val _ = Tiff.decode(b) }
        catch { case _: IllegalArgumentException | _: RuntimeException => () }
      }
    }
  }
}
