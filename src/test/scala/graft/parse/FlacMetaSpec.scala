package graft.parse

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.multimodal.Flac

/** flac_meta: STREAMINFO bit unpacking at field boundaries, block-chain
  * walk, strict poison posture. */
class FlacMetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def meta(b: Array[Byte]) = FlacMetaExpr.meta(b)

  test("bit-packed STREAMINFO fields round-trip, including extremes") {
    for {
      (sr, ch, bps, total) <- Seq(
        (44100, 2, 16, 1234567L),
        (8000, 1, 4, 0L),
        (655349, 8, 32, (1L << 36) - 1), // field maxima
        (96000, 3, 24, 1L))
    } {
      val r = meta(Flac.encode(sr, ch, bps, total))
      assert(r.getBoolean(0), s"$sr/$ch/$bps")
      assert(r.getInt(1) === sr && r.getInt(2) === ch && r.getInt(3) === bps)
      assert(r.getLong(4) === total)
      assert(r.getLong(5) === total * 1000L / sr)
      assert(r.getInt(6) === 1 && !r.getBoolean(7))
    }
  }

  test("optional blocks are walked and counted; tags flagged") {
    val r = meta(Flac.encode(48000, 2, 16, 480000L,
      tags = true, seektable = true, padding = 32))
    assert(r.getBoolean(0) && r.getInt(6) === 4 && r.getBoolean(7))
    assert(r.getLong(5) === 10000L) // 480000 samples at 48 kHz = 10 s
  }

  test("strict walk: poisons yield ok=false, never exceptions") {
    val good = Flac.encode(44100, 2, 16, 1000L, tags = true)
    def bad(b: Array[Byte]): Unit = assert(!meta(b).getBoolean(0))
    bad(null); bad(Array[Byte]('f', 'L', 'a', 'C'))
    bad(good.take(30))                                   // truncated
    bad { val b = good.clone(); b(0) = 'X'; b }          // magic
    bad { val b = good.clone()
      b(4) = ((b(4) & 0x80) | 4).toByte; b }             // tags lead
    bad { val b = good.clone(); b(5) = 0x7f.toByte; b }  // lying length
    bad { val b = good.clone(); b(4) = (b(4) | 0x7f).toByte; b } // type 127
    // zero sample rate is invalid-for-audio
    val zeroRate = {
      val b = Flac.encode(1, 1, 16, 0L).clone()
      // packed rate bytes are 18..20(high nibble): zero them
      b(18) = 0; b(19) = 0; b(20) = (b(20) & 0x0f).toByte
      b
    }
    bad(zeroRate)
    // byte-flip fuzz: always decode-or-ok=false
    val rnd = new scala.util.Random(161L)
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      meta(b) // must not throw
    }
  }

  test("kernel registered: SQL surface") {
    import spark.implicits._
    val df = Seq(Flac.encode(22050, 1, 8, 22050L)).toDF("payload")
    val r = df.select(call_function("flac_meta", col("payload")).as("m"))
      .select("m.ok", "m.duration_ms").head()
    assert(r.getBoolean(0) && r.getLong(1) === 1000L)
  }
}
