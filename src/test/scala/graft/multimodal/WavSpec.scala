package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class WavSpec extends AnyFunSuite {

  private def randomClip(rnd: scala.util.Random, n: Int, ch: Int,
                         rate: Int): Wav.Clip =
    Wav.Clip(rate, ch, Array.fill(n)(rnd.nextInt(65536).toShort))

  test("decode inverts encode exactly — mono/stereo, extreme samples") {
    val rnd = new scala.util.Random(42)
    for ((n, ch, rate) <- Seq((1, 1, 8000), (64, 2, 44100), (1001, 1, 16000))) {
      val clip = randomClip(rnd, n, ch, rate)
      val back = Wav.decode(Wav.encode(clip))
      assert(back.sampleRate === rate && back.channels === ch)
      assert(back.samples.toSeq === clip.samples.toSeq)
    }
    // full-range extremes round-trip (sign handling of the u16 -> Short cast)
    val ext = Wav.Clip(8000, 1, Array(Short.MinValue, Short.MaxValue, 0, -1, 1))
    assert(Wav.decode(Wav.encode(ext)).samples.toSeq === ext.samples.toSeq)
  }

  test("ancillary chunks are walked over, odd-length chunks stay aligned") {
    val clip = Wav.Clip(8000, 1, Array[Short](5, -5, 100))
    val wav = Wav.encode(clip)
    // splice an ODD-length LIST chunk (3 bytes + pad) between fmt and data;
    // patch the RIFF size so the container stays conformant
    val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 9, 9, 9, 0)
    val spliced = wav.take(36) ++ junk ++ wav.drop(36)
    val riffLen = (spliced.length - 8).toLong
    (0 until 4).foreach(i => spliced(4 + i) = ((riffLen >> (8 * i)) & 0xff).toByte)
    assert(Wav.decode(spliced).samples.toSeq === clip.samples.toSeq)
  }

  test("property: decode∘encode is identity over random clips") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val genClip = for {
      n <- Gen.choose(0, 512)
      ch <- Gen.choose(1, 8)
      rate <- Gen.oneOf(8000, 16000, 44100, 48000)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield {
      val rnd = new scala.util.Random(seed)
      Wav.Clip(rate, ch, Array.fill(n)(rnd.nextInt(65536).toShort))
    }
    val prop = Prop.forAll(genClip) { clip =>
      val back = Wav.decode(Wav.encode(clip))
      back.sampleRate == clip.sampleRate && back.channels == clip.channels &&
        back.samples.toSeq == clip.samples.toSeq
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("malformed/unsupported input throws, never crashes") {
    val good = Wav.encode(Wav.Clip(8000, 1, Array[Short](1, 2, 3)))
    intercept[IllegalArgumentException](Wav.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](Wav.decode(good.take(20))) // truncated
    val badTag = good.clone(); badTag(20) = 3 // float PCM unsupported
    intercept[IllegalArgumentException](Wav.decode(badTag))
    val badBits = good.clone(); badBits(34) = 8 // 8-bit unsupported
    intercept[IllegalArgumentException](Wav.decode(badBits))
  }

  test("decodeAudio maps poison payloads to ok=false, stats to real ones") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // samples 3, -4, 0: sum=-1, sumSq=25 -> mean=-1/3, rms=sqrt(25/3)
    val clip = Wav.Clip(16000, 2, Array[Short](3, -4, 0))
    val rows = Seq(
      Binary.MediaRow(1L, Wav.encode(clip), "audio", "wav"),
      Binary.MediaRow(2L, Array[Byte](0, 0, 0), "audio", "wav"))
    val out = Binary.decodeAudio(rows.toDS()).collect().sortBy(_.media_id)
    assert(out(0).ok && out(0).sample_rate === 16000 &&
      out(0).channels === 2 && out(0).n_samples === 3L)
    assert(out(0).mean_amp === math.floor(-1.0 / 3 * 1e6 + 0.5) / 1e6)
    assert(out(0).rms === math.floor(math.sqrt(25.0 / 3) * 1e6 + 0.5) / 1e6)
    assert(out(0).peak === 4L)
    assert(!out(1).ok && out(1).sample_rate === -1)
  }

  test("audioFrames: hand-computed energy + crossings, tail drop, poison") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // 9 samples, frameSize 4 -> 2 full frames, 1 tail sample dropped.
    // frame 0: (1, -2, 3, 0)  sum_abs=6, crossings: 1/-2, -2/3 -> 2
    //          (3/0 is not a crossing: 0 is non-negative like 3)
    // frame 1: (-5, -6, 7, 8) sum_abs=26, crossings: -6/7 -> 1
    val clip = Wav.Clip(8000, 1,
      Array[Short](1, -2, 3, 0, -5, -6, 7, 8, 9))
    val rows = Seq(
      Binary.MediaRow(1L, Wav.encode(clip), "audio", "wav"),
      Binary.MediaRow(2L, Array[Byte](1, 1), "audio", "wav"))
    val out = Binary.audioFrames(rows.toDS(), frameSize = 4).collect()
    val good = out.filter(_.ok).sortBy(_.frame)
    assert(good.length === 2)
    assert(good(0).frame === 0 && good(0).sum_abs === 6L &&
      good(0).zero_crossings === 2)
    assert(good(1).frame === 1 && good(1).sum_abs === 26L &&
      good(1).zero_crossings === 1)
    assert(out.exists(r => !r.ok && r.media_id === 2L))
  }
}
