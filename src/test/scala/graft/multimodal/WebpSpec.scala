package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.parse.WebpMetaExpr

/** `webp_meta` probe vs the fixture encoders: every container form
  * round-trips its header fields; malformed bytes yield ok=false rows,
  * never exceptions. */
class WebpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def probe(b: Array[Byte]):
      (Boolean, Option[String], Option[Int], Option[Int],
        Option[Boolean], Option[Boolean]) = {
    val r = WebpMetaExpr.meta(b)
    def os(i: Int) = if (r.isNullAt(i)) None else Some(r.getUTF8String(i).toString)
    def oi(i: Int) = if (r.isNullAt(i)) None else Some(r.getInt(i))
    def ob(i: Int) = if (r.isNullAt(i)) None else Some(r.getBoolean(i))
    (r.getBoolean(0), os(1), oi(2), oi(3), ob(4), ob(5))
  }

  test("lossy / lossless / extended headers round-trip") {
    assert(probe(Webp.encodeLossy(640, 480)) ===
      ((true, Some("lossy"), Some(640), Some(480), Some(false), Some(false))))
    // 14-bit boundary dims
    assert(probe(Webp.encodeLossy(16383, 1))._3 === Some(16383))
    assert(probe(Webp.encodeLossless(1, 1, alpha = false)) ===
      ((true, Some("lossless"), Some(1), Some(1), Some(false), Some(false))))
    assert(probe(Webp.encodeLossless(16384, 16384, alpha = true)) ===
      ((true, Some("lossless"), Some(16384), Some(16384), Some(true),
        Some(false))))
    assert(probe(Webp.encodeExtended(4000, 3000, alpha = true, anim = false)) ===
      ((true, Some("extended"), Some(4000), Some(3000), Some(true),
        Some(false))))
    assert(probe(Webp.encodeExtended(1 << 24, 7, alpha = false, anim = true)) ===
      ((true, Some("extended"), Some(1 << 24), Some(7), Some(false),
        Some(true))))
  }

  test("animated extended files report frame count and summed duration") {
    val b = Webp.encodeExtended(100, 50, alpha = false, anim = true,
      frames = Seq(40, 60, 80))
    val r = WebpMetaExpr.meta(b)
    assert(r.getBoolean(0) && r.getBoolean(5), "ok animated")
    assert(r.getInt(6) === 3 && r.getLong(7) === 180L)
    // zero-frame animation (ANIM parameters only): 0 frames, 0 ms
    val z = WebpMetaExpr.meta(Webp.encodeExtended(9, 9, alpha = false,
      anim = true))
    assert(z.getBoolean(0) && z.getInt(6) === 0 && z.getLong(7) === 0L)
    // non-animated extended: frame fields are null, not zero
    val n = WebpMetaExpr.meta(Webp.encodeExtended(9, 9, alpha = false,
      anim = false))
    assert(n.getBoolean(0) && n.isNullAt(6) && n.isNullAt(7))
    // a lying ANMF chunk size desynchronizes the walk -> malformed
    val bad = b.clone()
    bad(48) = (bad(48) + 1).toByte // first ANMF's size field
    assert(!WebpMetaExpr.meta(bad).getBoolean(0))
  }

  test("odd-sized chunks are padded and the RIFF size stays consistent") {
    val b = Webp.encodeLossless(5, 5, alpha = false, filler = 8) // 13-byte payload
    assert(b.length % 2 === 0, "odd chunk must carry a pad byte")
    assert(probe(b)._1 === true)
  }

  test("malformed payloads: ok=false with null fields, never a throw") {
    val base = Webp.encodeLossy(100, 50)
    val bad = Seq[Array[Byte]](
      null,
      Array[Byte](),
      base.take(15),                       // truncated
      { val b = base.clone(); b(8) = 'X'; b },      // not WEBP
      { val b = base.clone(); b(4) = (b(4) + 1).toByte; b }, // size lies
      { val b = base.clone(); b(12) = 'J'; b(13) = 'U'
        b(14) = 'N'; b(15) = 'K'; b },     // unknown leading chunk
      { val b = base.clone(); b(23) = 0; b },       // broken start code
      { val b = base.clone(); b(20) = 0x31; b },    // interframe leads
      { val b = Webp.encodeLossless(9, 9, alpha = false).clone()
        b(20) = 0x2e; b },                 // wrong VP8L signature
      { val b = Webp.encodeLossless(9, 9, alpha = false).clone()
        b(24) = (b(24) | 0xe0).toByte; b },// VP8L version != 0
      { val b = Webp.encodeExtended(9, 9, alpha = false, anim = false).clone()
        b(20) = (b(20) | 0x40).toByte; b } // VP8X reserved bit set
    )
    bad.foreach { b =>
      val (ok, f, w, h, a, an) = probe(b)
      assert(!ok && f.isEmpty && w.isEmpty && h.isEmpty &&
        a.isEmpty && an.isEmpty, s"payload ${Option(b).map(_.length)}")
    }
  }

  test("byte-flip fuzz: probe always terminates, ok or not") {
    val base = Webp.encodeExtended(123, 456, alpha = true, anim = true)
    val rnd = new scala.util.Random(5)
    TestSpark.timed(10000) {
      (0 until 500).foreach { _ =>
        val b = base.clone()
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        WebpMetaExpr.meta(b) // must return a row, never throw/hang
      }
    }
  }

  test("media_meta reports kind=webp with dims (and keeps WAV distinct)") {
    val rows = Seq(
      (1L, Webp.encodeLossy(64, 48)),
      (2L, { val b = Webp.encodeLossy(64, 48).clone(); b(23) = 0; b }))
      .toDF("id", "payload")
      .select(col("id"), call_function("media_meta", col("payload")).as("m"))
      .select(col("id"), col("m.kind"), col("m.width"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).toSet
    // damaged chunk headers still sniff as webp (kind from the RIFF type,
    // dims null) — the JPEG best-effort degradation rule
    assert(rows === Set((1L, "webp", 64), (2L, "webp", -1)))
  }

  test("webp_meta runs as a registered codegen'd kernel") {
    val rows = Seq(
      (1L, Webp.encodeLossy(32, 16)),
      (2L, Webp.encodeLossless(7, 9, alpha = true)),
      (3L, Array[Byte](1, 2, 3)))
      .toDF("id", "payload")
      .select(col("id"), call_function("webp_meta", col("payload")).as("m"))
      .select(col("id"), col("m.ok"), col("m.format"), col("m.width"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.getString(2)), if (r.isNullAt(3)) -1 else r.getInt(3)))
      .toSet
    assert(rows === Set((1L, true, Some("lossy"), 32),
      (2L, true, Some("lossless"), 7), (3L, false, None, -1)))
  }
}
