package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The GIF decoder, verified exactly (GIF is lossless — no tolerance
  * anywhere):
  *  1. decode∘encode identity over random palettes, dimensions, and the
  *     interlaced layout (our REAL LZW compressor on one side, our
  *     decoder on the other).
  *  2. Bit-exact cross-decoder agreement with the JDK ImageIO reader on
  *     our encoder's files, and with our decoder on ImageIO-WRITTEN
  *     files (an independent LZW implementation in each direction).
  *  3. Poison inputs throw fast — truncation, corrupt LZW chains,
  *     oversized headers — never a hang or wild allocation.
  */
class GifSpec extends AnyFunSuite {

  private def randomImage(rnd: scala.util.Random, w: Int, h: Int,
                          nColors: Int): Png.Image = {
    val palette = Array.fill(nColors)(rnd.nextInt(1 << 24))
    val px = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h) {
      // runs + noise: exercises dictionary hits AND misses
      val c = palette(
        if (rnd.nextInt(3) == 0) rnd.nextInt(nColors)
        else palette.length * i / (w * h))
      px(i * 3) = ((c >> 16) & 0xff).toByte
      px(i * 3 + 1) = ((c >> 8) & 0xff).toByte
      px(i * 3 + 2) = (c & 0xff).toByte
    }
    Png.Image(w, h, 3, px)
  }

  test("decode inverts encode exactly — sequential and interlaced") {
    val rnd = new scala.util.Random(3)
    for (trial <- 0 until 8) {
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(40)
      val n = 1 + rnd.nextInt(math.min(256, w * h))
      val img = randomImage(rnd, w, h, n)
      for (interlaced <- Seq(false, true)) {
        val back = Gif.decode(Gif.encode(img, interlaced))
        assert(back.width === w && back.height === h && back.channels === 3)
        assert(java.util.Arrays.equals(back.pixels, img.pixels),
          s"trial $trial ${w}x$h n=$n interlaced=$interlaced")
      }
    }
  }

  test("dictionary reset: >4096 dictionary entries round-trip") {
    // a large high-entropy image forces the LZW dictionary to fill and
    // reset mid-stream (the 12-bit ceiling path)
    val rnd = new scala.util.Random(9)
    val img = randomImage(rnd, 160, 120, 256)
    val back = Gif.decode(Gif.encode(img))
    assert(java.util.Arrays.equals(back.pixels, img.pixels))
  }

  test("ImageIO reads our files bit-exactly; we read ImageIO's") {
    val rnd = new scala.util.Random(5)
    for (trial <- 0 until 4) {
      val w = 8 + rnd.nextInt(48)
      val h = 8 + rnd.nextInt(32)
      val img = randomImage(rnd, w, h, 2 + rnd.nextInt(254))
      // direction 1: our encoder -> ImageIO reader
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Gif.encode(img, trial % 2 == 0)))
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = ref.getRGB(x, y)
        val d = (y * w + x) * 3
        assert(((rgb >> 16) & 0xff) === (img.pixels(d) & 0xff) &&
          ((rgb >> 8) & 0xff) === (img.pixels(d + 1) & 0xff) &&
          (rgb & 0xff) === (img.pixels(d + 2) & 0xff),
          s"trial $trial ImageIO<-ours pixel ($x,$y)")
      }
      // direction 2: ImageIO writer -> our decoder
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val d = (y * w + x) * 3
        bi.setRGB(x, y, ((img.pixels(d) & 0xff) << 16) |
          ((img.pixels(d + 1) & 0xff) << 8) | (img.pixels(d + 2) & 0xff))
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "gif", bos), "ImageIO gif write")
      val ours = Gif.decode(bos.toByteArray)
      assert(ours.width === w && ours.height === h)
      assert(java.util.Arrays.equals(ours.pixels, img.pixels),
        s"trial $trial ours<-ImageIO")
    }
  }

  test("animated: decodeFrames round-trips per-frame palettes and GCEs") {
    val rnd = new scala.util.Random(21)
    val w = 17; val h = 11
    val frames = Array.tabulate(4)(f =>
      randomImage(rnd, w, h, 3 + f * 5)) // different palette per frame
    val bytes = Gif.encodeAnimated(frames, interlaced = true)
    val back = Gif.decodeFrames(bytes)
    assert(back.length === 4)
    for (f <- 0 until 4)
      assert(java.util.Arrays.equals(back(f).pixels, frames(f).pixels),
        s"frame $f")
    // decode (first-frame semantics) agrees with frame 0
    assert(java.util.Arrays.equals(Gif.decode(bytes).pixels, frames(0).pixels))
    // ImageIO reads the same frames bit-exactly (independent LZW + LCT)
    val reader = javax.imageio.ImageIO
      .getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(reader.getNumImages(true) === 4)
    for (f <- 0 until 4) {
      val ref = reader.read(f)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = ref.getRGB(x, y)
        val d = (y * w + x) * 3
        assert(((rgb >> 16) & 0xff) === (frames(f).pixels(d) & 0xff) &&
          ((rgb >> 8) & 0xff) === (frames(f).pixels(d + 1) & 0xff) &&
          (rgb & 0xff) === (frames(f).pixels(d + 2) & 0xff),
          s"ImageIO frame $f pixel ($x,$y)")
      }
    }
  }

  test("poison inputs throw, never hang or over-allocate") {
    def bad(b: Array[Byte]): Unit =
      assertThrows[IllegalArgumentException](Gif.decode(b))
    bad(Array[Byte]())
    bad("GIF89a".getBytes) // header only
    bad("NOTGIF_AT_ALL".getBytes)
    val ok = Gif.encode(randomImage(new scala.util.Random(1), 20, 10, 16))
    bad(java.util.Arrays.copyOfRange(ok, 0, ok.length / 2)) // truncated LZW
    // claimed 40000x40000 image must hit the raster cap before allocating.
    // The descriptor offset is structural (13 + GCT) — indexWhere(0x2c)
    // would find a palette byte that happens to be 44
    val huge = ok.clone()
    val id = 13 + 3 * (2 << ((ok(10) & 0xff) & 7))
    assert((huge(id) & 0xff) === 0x2c)
    huge(id + 5) = 0x40.toByte; huge(id + 6) = 0x9c.toByte // w = 40000
    huge(id + 7) = 0x40.toByte; huge(id + 8) = 0x9c.toByte // h = 40000
    bad(huge)
    // corrupt LZW: out-of-sequence code (max 12-bit everywhere)
    val corrupt = ok.clone()
    var p = id + 10 // min-code byte
    p += 1
    // stomp the first data sub-block with 0xFF bytes
    val bs = corrupt(p) & 0xff
    for (j <- p + 1 until math.min(p + 1 + bs, corrupt.length))
      corrupt(j) = 0xff.toByte
    bad(corrupt)
  }
}
