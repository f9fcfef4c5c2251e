package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class GzipSpec extends AnyFunSuite {

  test("decode inverts encode; empty payload round-trips") {
    val data = "hello crawl corpus é日😀".getBytes("UTF-8")
    assert(Gzip.decode(Gzip.encode(data)).toSeq === data.toSeq)
    assert(Gzip.decode(Gzip.encode(Array.emptyByteArray)).isEmpty)
  }

  test("property: round-trip over random binary payloads") {
    val rnd = new scala.util.Random(7)
    (0 until 30).foreach { i =>
      val n = rnd.nextInt(10000)
      val data = Array.fill(n)(rnd.nextInt(256).toByte)
      assert(Gzip.decode(Gzip.encode(data)).toSeq === data.toSeq, s"case $i")
    }
  }

  test("multi-member streams decode as the concatenation") {
    val a = "first shard ".getBytes("UTF-8")
    val b = "second shard".getBytes("UTF-8")
    val cat = Gzip.encode(a) ++ Gzip.encode(b)
    assert(new String(Gzip.decode(cat), "UTF-8") === "first shard second shard")
  }

  test("trailing garbage / corrupt trailing member throws, never partial-ok") {
    val a = Gzip.encode("good shard".getBytes("UTF-8"))
    val b = Gzip.encode("second shard".getBytes("UTF-8"))
    // raw trailing garbage after a valid member
    intercept[IllegalArgumentException](
      Gzip.decode(a ++ Array[Byte](0x42, 0x42, 0x42)))
    // truncated second member (cut mid-body, past its header)
    intercept[IllegalArgumentException](
      Gzip.decode(a ++ java.util.Arrays.copyOf(b, b.length - 10)))
    // second member with corrupted magic — GZIPInputStream would have
    // silently returned only the first member's payload here
    val badMagic = b.clone(); badMagic(0) = 0x00
    intercept[IllegalArgumentException](Gzip.decode(a ++ badMagic))
    // corrupted CRC in the trailer of the last member
    val badCrc = (a ++ b).clone()
    badCrc(badCrc.length - 6) = (badCrc(badCrc.length - 6) ^ 0x7f).toByte
    intercept[IllegalArgumentException](Gzip.decode(badCrc))
  }

  test("poison inputs throw, and the zip-bomb cap holds") {
    intercept[IllegalArgumentException](Gzip.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](Gzip.decode(Array.emptyByteArray))
    val good = Gzip.encode("some payload to truncate".getBytes("UTF-8"))
    intercept[IllegalArgumentException](
      Gzip.decode(java.util.Arrays.copyOf(good, good.length - 4)))
    // 1 MB of zeros compresses to ~1 KB; a 1000-byte cap must refuse it
    val bombish = Gzip.encode(new Array[Byte](1 << 20))
    assert(bombish.length < 4096)
    val e = intercept[IllegalArgumentException](
      Gzip.decode(bombish, maxOut = 1000))
    assert(e.getMessage.contains("cap"))
    // corrupted deflate body (flip bytes mid-stream)
    val bad = good.clone(); bad(12) = (bad(12) ^ 0x55).toByte
    bad(13) = (bad(13) ^ 0x55).toByte
    intercept[IllegalArgumentException](Gzip.decode(bad))
  }

  test("gunzipText: ok rows carry the text, poison rows ok=false") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      Binary.MediaRow(1L, Gzip.encode("alpha beta".getBytes("UTF-8")),
        "text", "gzip"),
      Binary.MediaRow(2L, Array[Byte](0x42, 0x42), "text", "gzip"))
    val out = Binary.gunzipText(rows.toDS()).collect().sortBy(_.media_id)
    assert(out(0) === Binary.TextPayload(1L, ok = true, "alpha beta"))
    assert(out(1) === Binary.TextPayload(2L, ok = false, null))
  }
}
