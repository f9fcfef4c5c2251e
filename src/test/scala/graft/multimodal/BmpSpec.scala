package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** BMP codec: encode∘decode round-trips across bit depths, row orders
  * and BI_RLE8; ImageIO cross-check; poison payloads throw fast. */
class BmpSpec extends AnyFunSuite {

  private def base(id: Int)(r: Int, c: Int): Int = (id + 3 * r + 5 * c) % 256

  test("24/32-bit truecolor round-trips, both row orders, pad dropped") {
    for {
      mode <- Seq(Bmp.Rgb24: Bmp.Mode, Bmp.Rgb32)
      td <- Seq(false, true)
    } {
      val img = Bmp.decode(Bmp.encode(13, 7, mode, td, base(5)))
      assert(img.width === 13 && img.height === 7 && img.channels === 3)
      for (r <- 0 until 7; c <- 0 until 13; k <- 0 until 3)
        assert((img.pixels((r * 13 + c) * 3 + k) & 0xff)
          === (base(5)(r, c) + 11 * k) % 256, s"($r,$c,$k) $mode td=$td")
    }
  }

  test("8-bit palette expands through the color table; both row orders") {
    for (td <- Seq(false, true)) {
      val img = Bmp.decode(Bmp.encode(11, 6, Bmp.Indexed8(rle = false),
        td, base(9)))
      assert(img.channels === 3)
      for (r <- 0 until 6; c <- 0 until 11) {
        val (pr, pg, pb) = Bmp.paletteEntry(base(9)(r, c))
        val o = (r * 11 + c) * 3
        assert((img.pixels(o) & 0xff) === pr, s"R ($r,$c) td=$td")
        assert((img.pixels(o + 1) & 0xff) === pg)
        assert((img.pixels(o + 2) & 0xff) === pb)
      }
    }
  }

  test("1-bit bilevel packs MSB-first, pads rows to 4 bytes") {
    // width 33: 5 data bytes -> stride 8, exercising both paddings
    def bit(r: Int, c: Int): Int = if ((r + c) % 2 == 0) 1 else 0
    val img = Bmp.decode(Bmp.encode(33, 5, Bmp.Bilevel1, topDown = false, bit))
    for (r <- 0 until 5; c <- 0 until 33; k <- 0 until 3)
      assert((img.pixels((r * 33 + c) * 3 + k) & 0xff) === 255 * bit(r, c),
        s"($r,$c,$k)")
  }

  test("BI_RLE8 round-trips: runs, absolute blocks, short tails") {
    // constant every-3rd rows force real runs; other rows take the
    // absolute path with <3-pixel tails (the per-pixel run-1 case)
    def v(r: Int, c: Int): Int = if (r % 3 == 0) 77 else base(31)(r, c)
    val img = Bmp.decode(Bmp.encode(14, 9, Bmp.Indexed8(rle = true),
      topDown = false, v))
    for (r <- 0 until 9; c <- 0 until 14) {
      val (pr, pg, pb) = Bmp.paletteEntry(v(r, c))
      val o = (r * 14 + c) * 3
      assert((img.pixels(o) & 0xff) === pr, s"($r,$c)")
      assert((img.pixels(o + 1) & 0xff) === pg)
      assert((img.pixels(o + 2) & 0xff) === pb)
    }
  }

  test("BI_RLE8 delta escape skips pixels as literal zero bytes") {
    // hand-built stream: run(2, idx 3), delta(+1, +1), run(1, idx 5), EOB
    // on a 4x3 bottom-up bitmap — everything not written stays 0
    val pal = (0 until 256).flatMap { j =>
      val (r, g, b) = Bmp.paletteEntry(j); Seq(b, g, r, 0)
    }.map(_.toByte).toArray
    val rle = Array(2, 3, 0, 2, 1, 1, 1, 5, 0, 1).map(_.toByte)
    val hdr = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { hdr.write(v & 0xff); hdr.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    hdr.write('B'); hdr.write('M'); w32(14 + 40 + 1024 + rle.length)
    w16(0); w16(0); w32(14 + 40 + 1024)
    w32(40); w32(4); w32(3); w16(1); w16(8); w32(1); w32(rle.length)
    w32(2835); w32(2835); w32(256); w32(0)
    hdr.write(pal); hdr.write(rle)
    val img = Bmp.decode(hdr.toByteArray)
    assert(img.width === 4 && img.height === 3)
    def rgb(r: Int, c: Int): (Int, Int, Int) = {
      val o = (r * 4 + c) * 3
      ((img.pixels(o) & 0xff), (img.pixels(o + 1) & 0xff),
        (img.pixels(o + 2) & 0xff))
    }
    // bottom-up: file row 0 = image row 2
    assert(rgb(2, 0) === Bmp.paletteEntry(3))
    assert(rgb(2, 1) === Bmp.paletteEntry(3))
    assert(rgb(2, 2) === ((0, 0, 0))) // delta-skipped
    assert(rgb(2, 3) === ((0, 0, 0)))
    assert(rgb(1, 0) === ((0, 0, 0))) // delta skipped into file row 1 col 3
    assert(rgb(1, 3) === Bmp.paletteEntry(5))
    assert(rgb(0, 0) === ((0, 0, 0))) // rows after EOB stay zero
  }

  test("the JDK ImageIO BMP reader decodes our encodings identically") {
    // independent-implementation cross-check (the TiffSpec discipline)
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("bmp")
    assume(readers.hasNext, "no ImageIO BMP plugin in this JDK")
    for {
      (mode, td) <- Seq((Bmp.Rgb24: Bmp.Mode, false), (Bmp.Rgb24, true),
        (Bmp.Rgb32, false), (Bmp.Indexed8(false), false),
        (Bmp.Indexed8(true), false), (Bmp.Bilevel1, false))
    } {
      val bytes = Bmp.encode(19, 13, mode,
        topDown = td, if (mode == Bmp.Bilevel1) (r, c) => (r + c) % 2
        else base(47))
      val ours = Bmp.decode(bytes)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected $mode td=$td")
      assert(img.getWidth === 19 && img.getHeight === 13)
      for (r <- 0 until 13; c <- 0 until 19) {
        val rgb = img.getRGB(c, r)
        val o = (r * 19 + c) * 3
        assert(((rgb >> 16) & 0xff) === (ours.pixels(o) & 0xff),
          s"R ($r,$c) $mode td=$td")
        assert(((rgb >> 8) & 0xff) === (ours.pixels(o + 1) & 0xff),
          s"G ($r,$c) $mode td=$td")
        assert((rgb & 0xff) === (ours.pixels(o + 2) & 0xff),
          s"B ($r,$c) $mode td=$td")
      }
    }
  }

  test("poison payloads throw fast: truncation, bad fields, crafted dims") {
    val good = Bmp.encode(10, 8, Bmp.Rgb24, topDown = false, base(3))
    def bad(mut: Array[Byte] => Unit): Unit = {
      val b = good.clone(); mut(b)
      intercept[IllegalArgumentException](Bmp.decode(b))
    }
    intercept[IllegalArgumentException](Bmp.decode(Array[Byte]('B', 'M')))
    intercept[IllegalArgumentException](Bmp.decode(good.take(40)))
    bad(b => b(0) = 'X')                       // magic
    bad(b => b(26) = 2)                        // planes
    bad(b => b(28) = 16)                       // 16-bpp out of scope
    bad(b => b(30) = 3)                        // BI_BITFIELDS out of scope
    bad { b => b(18) = -1; b(19) = -1; b(20) = -1; b(21) = 0x7f } // huge w
    bad { b => b(10) = -1; b(11) = -1 }        // data offset past end
    // truncated pixel data
    intercept[IllegalArgumentException](
      Bmp.decode(good.take(good.length - 8)))
    // RLE truncation mid-stream
    val rle = Bmp.encode(14, 9, Bmp.Indexed8(rle = true),
      topDown = false, base(31))
    intercept[IllegalArgumentException](Bmp.decode(rle.take(rle.length - 3)))
  }

  test("byte-flip fuzz: decode() always terminates with decode-or-throw") {
    val seeds = Seq(
      Bmp.encode(12, 7, Bmp.Rgb24, topDown = true, base(1)),
      Bmp.encode(9, 9, Bmp.Indexed8(rle = true), topDown = false, base(2)),
      Bmp.encode(17, 4, Bmp.Bilevel1, topDown = false,
        (r, c) => (r + c) % 2))
    val rnd = new scala.util.Random(152L)
    for (seed <- seeds; _ <- 0 until 300) {
      val b = seed.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try { Bmp.decode(b); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  test("sniffModality flags BMP payloads") {
    import org.apache.spark.sql.functions._
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq(Bmp.encode(4, 3, Bmp.Rgb24, topDown = false, base(0)))
      .toDF("payload")
    assert(df.select(Binary.sniffModality(col("payload")))
      .head().getString(0) === "image/bmp")
  }
}
