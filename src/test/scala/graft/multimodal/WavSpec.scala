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

  // ---- G.711 mu-law (format 7) ------------------------------------------

  test("ulaw: expand(compress(s)) matches hand-checked codewords") {
    // ITU G.711 anchors: 0 -> 0; full-scale -> +/-32124 after companding
    assert(Wav.ulawExpand(Wav.ulawCompress(0)) === 0)
    assert(Wav.ulawExpand(Wav.ulawCompress(32767)) === 32124)
    assert(Wav.ulawExpand(Wav.ulawCompress(-32768)) === -32124)
    // silence codeword is 0xFF (complemented all-zeros)
    assert(Wav.ulawCompress(0) === 0xff)
    // bottom segment quantizes in steps of 8: 0..3 -> 0, 4..11 -> 8
    assert(Wav.ulawExpand(Wav.ulawCompress(3)) === 0)
    assert(Wav.ulawExpand(Wav.ulawCompress(4)) === 8)
    assert(Wav.ulawExpand(Wav.ulawCompress(11)) === 8)
  }

  test("ulaw: companding error is bounded by the segment step") {
    var s = -32768
    while (s <= 32767) {
      val d = Wav.ulawExpand(Wav.ulawCompress(s)).toInt
      // segment step for |s|: 2^(exp+3); error < step (quantization floor)
      val x = math.min(math.abs(s), 32635) + 132
      var exp = 7
      while (exp > 0 && x < (1 << (exp + 7))) exp -= 1
      assert(math.abs(d - math.max(-32635, math.min(32635, s))) <
        (1 << (exp + 3)) + 132,
        s"sample $s decoded to $d")
      // sign is always preserved (or zero)
      assert(d == 0 || (d < 0) == (s < 0), s"sign flip at $s -> $d")
      s += 17 // full sweep at stride 17 covers every segment
    }
  }

  test("ulaw WAV: decode(encodeUlaw(clip)) = per-sample companded clip") {
    val rnd = new scala.util.Random(3)
    val samples = Array.fill(301)(rnd.nextInt(65536).toShort)
    val clip = Wav.Clip(8000, 1, samples)
    val back = Wav.decode(Wav.encodeUlaw(clip))
    assert(back.sampleRate === 8000 && back.channels === 1)
    assert(back.samples.toSeq ===
      samples.toSeq.map(s => Wav.ulawExpand(Wav.ulawCompress(s.toInt))))
    // idempotence: companded values are fixed points of the codec
    val again = Wav.decode(Wav.encodeUlaw(Wav.Clip(8000, 1, back.samples)))
    assert(again.samples.toSeq === back.samples.toSeq)
  }

  test("alaw: expand(compress(s)) matches hand-checked codewords") {
    // ITU G.711 anchors: silence codeword is 0xD5 (sign|0 XOR 0x55);
    // A-law has no true zero — inputs 0..7 decode to +8
    assert(Wav.alawCompress(0) === 0xd5)
    assert(Wav.alawExpand(Wav.alawCompress(0)) === 8)
    // full scale companded to +/-32256 (segment 7, mantissa 15)
    assert(Wav.alawExpand(Wav.alawCompress(32767)) === 32256)
    assert(Wav.alawExpand(Wav.alawCompress(-32768)) === -32256)
    // bottom segment quantizes in steps of 16: 0..15 -> 8, 16..31 -> 24
    assert(Wav.alawExpand(Wav.alawCompress(15)) === 8)
    assert(Wav.alawExpand(Wav.alawCompress(16)) === 24)
    assert(Wav.alawExpand(Wav.alawCompress(31)) === 24)
    // segment-1 boundary: 256..271 -> 264 (first seg-1 cell midpoint)
    assert(Wav.alawExpand(Wav.alawCompress(256)) === 264)
    assert(Wav.alawExpand(Wav.alawCompress(271)) === 264)
  }

  test("alaw: companding error bounded by the segment step, full sweep") {
    var s = -32768
    while (s <= 32767) {
      val d = Wav.alawExpand(Wav.alawCompress(s)).toInt
      val m = if (s >= 0) s >> 3 else ((-s) - 1) >> 3
      var seg = 0
      while (seg < 7 && m >= (0x20 << seg)) seg += 1
      // cell width in the 16-bit domain is 16<<max(seg-1,0); the decoded
      // value is its midpoint, so error <= half a cell
      assert(math.abs(d - s) <= (8 << math.max(seg - 1, 0)),
        s"sample $s decoded to $d (seg $seg)")
      // sign is strictly preserved (negatives stay negative; 0..7 -> +8)
      assert((d < 0) === (s < 0), s"sign flip at $s -> $d")
      s += 1
    }
  }

  test("alaw WAV: decode(encodeAlaw(clip)) = per-sample companded clip") {
    val rnd = new scala.util.Random(6)
    val samples = Array.fill(301)(rnd.nextInt(65536).toShort)
    val clip = Wav.Clip(8000, 1, samples)
    val back = Wav.decode(Wav.encodeAlaw(clip))
    assert(back.sampleRate === 8000 && back.channels === 1)
    assert(back.samples.toSeq ===
      samples.toSeq.map(s => Wav.alawExpand(Wav.alawCompress(s.toInt))))
    // idempotence: companded values are fixed points of the codec
    val again = Wav.decode(Wav.encodeAlaw(Wav.Clip(8000, 1, back.samples)))
    assert(again.samples.toSeq === back.samples.toSeq)
  }

  test("alaw: wrong bit depth in the fmt chunk throws") {
    val alaw = Wav.encodeAlaw(Wav.Clip(8000, 1, Array[Short](1, 2, 3)))
    val badBits = alaw.clone(); badBits(34) = 16 // bits field: 8 -> 16
    val e = intercept[IllegalArgumentException](Wav.decode(badBits))
    assert(e.getMessage.contains("A-law bit depth"))
  }

  // ---- IMA/DVI ADPCM (format 17) ----------------------------------------

  test("adpcm: constant clip round-trips exactly (step stays minimal)") {
    val samples = Array.fill(100)(1234.toShort)
    val back = Wav.decode(Wav.encodeAdpcm(Wav.Clip(8000, 1, samples)))
    assert(back.samples.toSeq === samples.toSeq)
  }

  test("adpcm: fact chunk trims final-block padding to the true count") {
    // blockAlign 36 -> 65 samples/block; 70 samples -> 2 blocks, 60 pad
    val samples = Array.tabulate(70)(i => (i * 100).toShort)
    val back = Wav.decode(Wav.encodeAdpcm(Wav.Clip(8000, 1, samples)))
    assert(back.samples.length === 70)
    // first sample of each block is stored verbatim in the block header
    assert(back.samples(0) === samples(0))
    assert(back.samples(65) === back.samples(65)) // decoded, in range
  }

  test("adpcm: slow ramp tracks within one step; error bounded on noise") {
    // adaptive quantization: a ramp slower than the min step is tracked
    // closely once the stepper locks on
    val ramp = Array.tabulate(200)(i => (i * 3).toShort)
    val rBack = Wav.decode(Wav.encodeAdpcm(Wav.Clip(8000, 1, ramp)))
    val rErr = rBack.samples.zip(ramp).map { case (a, b) => math.abs(a - b) }
    assert(rErr.drop(10).max <= 16, s"ramp error ${rErr.drop(10).max}")
    // white noise: error bounded by the max step size (32767/8 worst case
    // transient); sanity that decode stays in int16 and tracks at all
    val rnd = new scala.util.Random(9)
    val noise = Array.fill(500)((rnd.nextInt(8192) - 4096).toShort)
    val nBack = Wav.decode(Wav.encodeAdpcm(Wav.Clip(8000, 1, noise)))
    assert(nBack.samples.length === 500)
    val nErr = nBack.samples.zip(noise).map { case (a, b) => math.abs(a - b) }
    // mean abs error well under the signal amplitude (codec is tracking)
    assert(nErr.map(_.toLong).sum / 500 < 2048, s"mean err ${nErr.map(_.toLong).sum / 500}")
  }

  test("adpcm: decode state continues across blocks") {
    // 130 samples = 3 blocks (65/block); a sine sweep leaves a non-zero
    // step index at each block boundary, which the encoder carries over —
    // decode must agree with an independent single-pass state walk
    val samples = Array.tabulate(130)(i =>
      (math.sin(i * 0.3) * 12000).toShort)
    val wav = Wav.encodeAdpcm(Wav.Clip(8000, 1, samples))
    val back = Wav.decode(wav)
    assert(back.samples.length === 130)
    // replay the combined encode+decode walk independently: at block
    // starts the header re-anchors pred to the RAW sample (stored
    // verbatim, no nibble emitted) while idx carries over — so a wrong
    // carried idx would diverge every block-2+ sample
    var pred = samples(0).toInt; var idx = 0
    val walk = new Array[Int](130)
    walk(0) = pred
    for (k <- 1 until 130) {
      if (k % 65 == 0) {
        pred = samples(k).toInt
        walk(k) = pred
      } else {
        val nib = Wav.adpcmEncodeNibble(samples(k).toInt, pred, idx)
        val (p, i2) = Wav.adpcmStep(nib, pred, idx)
        pred = p; idx = i2
        walk(k) = p
      }
    }
    for (k <- 0 until 130) assert(back.samples(k).toInt === walk(k), s"k=$k")
  }

  test("adpcm/ulaw: malformed and unsupported inputs throw") {
    val clip = Wav.Clip(8000, 1, Array[Short](1, 2, 3))
    // stereo ADPCM unsupported
    intercept[IllegalArgumentException](
      Wav.encodeAdpcm(Wav.Clip(8000, 2, Array[Short](1, 2))))
    val adpcm = Wav.encodeAdpcm(clip)
    // corrupt the in-header step index past 88
    val badIdx = adpcm.clone()
    val dataOff = {
      // RIFF(12) + fmt(8+16) + fact(8+4) + data hdr(8) -> block at 56
      56 + 2
    }
    badIdx(dataOff) = 99.toByte
    intercept[IllegalArgumentException](Wav.decode(badIdx))
    // data not a multiple of block align: shrink the data chunk by 1
    val ragged = adpcm.dropRight(1)
    val dlenOff = 52 // data body starts at 56 (RIFF+fmt+fact+data hdr)
    val newLen = (ragged.length - 56).toLong
    (0 until 4).foreach(i =>
      ragged(dlenOff + i) = ((newLen >> (8 * i)) & 0xff).toByte)
    intercept[IllegalArgumentException](Wav.decode(ragged))
    // mu-law with a wrong bit depth in the header
    val ulaw = Wav.encodeUlaw(clip)
    val badBits = ulaw.clone(); badBits(34) = 16
    intercept[IllegalArgumentException](Wav.decode(badBits))
  }
}
