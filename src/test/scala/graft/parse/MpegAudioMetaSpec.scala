package graft.parse

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.multimodal.Mp3

/** mpeg_audio_meta: publicly-documented frame constants pinned
  * independently of the shared tables; tag handling; strict-walk
  * poison posture. */
class MpegAudioMetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def meta(b: Array[Byte]) = MpegAudioMetaExpr.meta(b)

  test("frame lengths match publicly documented constants") {
    // the famous 417/418-byte MPEG-1 Layer III 128 kbps @ 44100 frame
    assert(Mp3.encode(3, 3, Seq(9), 0, mono = false, pad = _ => 0)
      .length === 417)
    assert(Mp3.encode(3, 3, Seq(9), 0, mono = false, pad = _ => 1)
      .length === 418)
    // MPEG-2 Layer III 64 kbps @ 22050: floor(72*64000/22050) = 208
    assert(Mp3.encode(2, 3, Seq(8), 0, mono = true, pad = _ => 0)
      .length === 208)
    // MPEG-1 Layer I 448 kbps @ 32000: (12*448000/32000)*4 = 672
    assert(Mp3.encode(3, 1, Seq(14), 2, mono = false, pad = _ => 0)
      .length === 672)
    // MPEG-2.5 Layer III 8 kbps @ 8000: 72*8000/8000 = 72
    assert(Mp3.encode(0, 3, Seq(1), 2, mono = true, pad = _ => 0)
      .length === 72)
  }

  test("CBR stream: all fields, all-integer duration") {
    val b = Mp3.encode(3, 3, Seq.fill(5)(9), 0, mono = false)
    val r = meta(b)
    assert(r.getBoolean(0)) // ok
    assert(r.getUTF8String(1).toString === "1")
    assert(r.getInt(2) === 3 && r.getInt(3) === 44100 && r.getInt(4) === 2)
    assert(r.getInt(5) === 5)
    // 5*1152 samples at 44100 Hz: 5760000/44100 = 130 ms (integer floor)
    assert(r.getLong(6) === 130L)
    assert(r.getInt(7) === 128 && !r.getBoolean(8))
    assert(!r.getBoolean(9) && !r.getBoolean(10))
  }

  test("VBR stream: vbr=true, NULL bitrate; MPEG-2.5 576-sample frames") {
    val b = Mp3.encode(0, 3, Seq(3, 7, 3, 11), 1, mono = true)
    val r = meta(b)
    assert(r.getBoolean(0) && r.getUTF8String(1).toString === "2.5")
    assert(r.getInt(3) === 12000 && r.getInt(4) === 1 && r.getInt(5) === 4)
    assert(r.getLong(6) === 4L * 576 * 1000 / 12000)
    assert(r.isNullAt(7) && r.getBoolean(8))
  }

  test("ID3v2 (with footer) and ID3v1 are skipped and flagged") {
    for (footer <- Seq(false, true)) {
      val b = Mp3.encode(2, 2, Seq.fill(3)(5), 2, mono = false,
        id3v2 = Some(200), id3v2Footer = footer, id3v1 = true)
      val r = meta(b)
      assert(r.getBoolean(0), s"footer=$footer")
      assert(r.getInt(2) === 2 && r.getInt(3) === 16000 && r.getInt(5) === 3)
      assert(r.getBoolean(9) && r.getBoolean(10))
    }
  }

  test("strict walk: truncation, sync loss, free bitrate, lies -> ok=false") {
    val good = Mp3.encode(3, 3, Seq.fill(3)(9), 0, mono = false,
      id3v2 = Some(60))
    assert(meta(good).getBoolean(0))
    def bad(b: Array[Byte]): Unit = assert(!meta(b).getBoolean(0))
    bad(null); bad(Array[Byte](1, 2, 3))
    bad(good.take(good.length - 5)) // truncated final frame
    bad(good ++ Array[Byte](0, 0))  // trailing garbage
    bad { val b = good.clone(); b(70) = 0x00.toByte; b } // sync flip
    bad { val b = good.clone(); b(72) = (b(72) & 0x0f).toByte; b } // free br
    bad { val b = good.clone(); b(9) = (b(9) ^ 0x40).toByte; b } // size lie
    bad { val b = good.clone(); b(6) = 0x80.toByte; b } // non-syncsafe size
    // reserved version (bits 01) and reserved layer (bits 00)
    bad { val b = good.clone(); b(71) = (b(71) & ~0x18 | 0x08).toByte; b }
    bad { val b = good.clone(); b(71) = (b(71) & ~0x06).toByte; b }
  }

  test("inconsistent mid-stream parameters are rejected") {
    // build two frames by hand-concatenation with different samplerates
    val f0 = Mp3.encode(3, 3, Seq(9), 0, mono = false, pad = _ => 0)
    val f1 = Mp3.encode(3, 3, Seq(9), 1, mono = false, pad = _ => 0)
    assert(!meta(f0 ++ f1).getBoolean(0))
    // same stream but consistent: ok
    assert(meta(f0 ++ f0).getBoolean(0))
    // mixed bitrates remain ok (VBR), mixed channel modes do not
    val m = Mp3.encode(3, 3, Seq(9), 0, mono = true, pad = _ => 0)
    assert(!meta(f0 ++ m).getBoolean(0))
  }

  test("kernel registered: SQL surface and null propagation") {
    import spark.implicits._
    val df = Seq(
      (1L, Mp3.encode(3, 3, Seq.fill(2)(9), 0, mono = false)),
      (2L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val out = df.select($"id",
      call_function("mpeg_audio_meta", $"payload").as("m"))
      .select($"id", $"m.ok", $"m.bitrate_kbps").orderBy("id").collect()
    assert(out(0).getBoolean(1) && out(0).getInt(2) === 128)
    assert(out(1).isNullAt(1)) // null payload -> null struct
  }
}
