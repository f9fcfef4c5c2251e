package graft.parse

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.multimodal.Mp4

/** mp4_meta: box framing in both size widths and header versions,
  * track walking, strict poison posture. */
class Mp4MetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def meta(b: Array[Byte]) = Mp4MetaExpr.meta(b)

  test("v0 and v1 headers, both size widths, track mixes round-trip") {
    for {
      v1 <- Seq(false, true)
      large <- Seq(false, true)
    } {
      val b = Mp4.encode("isom", 30000, 90000,
        Seq(Mp4.Track(video = true, 1920, 1080),
          Mp4.Track(video = false, 0, 0)),
        v1 = v1, largeMdat = large)
      val r = meta(b)
      assert(r.getBoolean(0), s"v1=$v1 large=$large")
      assert(r.getUTF8String(1).toString === "isom")
      assert(r.getLong(2) === 3000L) // 90000/30000 s = 3 s
      assert(r.getInt(3) === 2)
      assert(r.getBoolean(4) && r.getBoolean(5))
      assert(r.getInt(6) === 1920 && r.getInt(7) === 1080)
    }
  }

  test("audio-only and trackless files carry null dims") {
    val a = meta(Mp4.encode("mp42", 1000, 1500,
      Seq(Mp4.Track(video = false, 0, 0))))
    assert(a.getBoolean(0) && !a.getBoolean(4) && a.getBoolean(5))
    assert(a.isNullAt(6) && a.isNullAt(7))
    assert(a.getLong(2) === 1500L)
    val none = meta(Mp4.encode("mp42", 1000, 0, Nil))
    assert(none.getBoolean(0) && none.getInt(3) === 0)
  }

  test("first VIDEO track's dims win over later ones") {
    val r = meta(Mp4.encode("isom", 600, 600,
      Seq(Mp4.Track(video = false, 0, 0),
        Mp4.Track(video = true, 640, 480),
        Mp4.Track(video = true, 1280, 720))))
    assert(r.getInt(6) === 640 && r.getInt(7) === 480)
  }

  test("strict walk: poisons yield ok=false, never exceptions") {
    val good = Mp4.encode("isom", 1000, 5000,
      Seq(Mp4.Track(video = true, 320, 240)))
    def bad(b: Array[Byte]): Unit = assert(!meta(b).getBoolean(0))
    bad(null); bad(Array[Byte](0, 0, 0, 8, 'f', 't', 'y', 'p'))
    bad(good.take(good.length - 3)) // truncated mdat
    bad { val b = good.clone(); b(4) = 'X'; b }  // not ftyp
    bad { val b = good.clone(); b(3) = 3; b }    // lying ftyp size
    bad { val b = good.clone()
      // zero mvhd timescale (ftyp 20 + moov hdr 8 + mvhd hdr 8 + 12)
      for (j <- 0 until 4) b(48 + j) = 0; b }
    // moov missing entirely: ftyp + bare mdat
    val noMoov = {
      val full = Mp4.encode("isom", 1000, 1, Nil)
      // strip the moov box: ftyp(20) ++ rest-after-moov
      val moovSize = (((full(20) & 0xff) << 24) | ((full(21) & 0xff) << 16) |
        ((full(22) & 0xff) << 8) | (full(23) & 0xff))
      full.take(20) ++ full.drop(20 + moovSize)
    }
    bad(noMoov)
    // byte-flip fuzz
    val rnd = new scala.util.Random(167L)
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      meta(b) // must not throw
    }
  }

  test("kernel registered: SQL surface") {
    import spark.implicits._
    val df = Seq(Mp4.encode("isom", 1000, 2500,
      Seq(Mp4.Track(video = true, 64, 48)))).toDF("payload")
    val r = df.select(call_function("mp4_meta", col("payload")).as("m"))
      .select("m.ok", "m.duration_ms", "m.width").head()
    assert(r.getBoolean(0) && r.getLong(1) === 2500L && r.getInt(2) === 64)
  }
}
