package graft.multimodal

/** Pure-JVM RIFF/WAVE codec — a REAL sample decoder (not a stub): chunk
  * walk (fmt/fact/data, ancillary chunks skipped) + sample extraction for
  * three spec'd encodings:
  *
  *  - format 1 — integer PCM, 16-bit little-endian (byte layout only);
  *  - format 6 — G.711 A-law: companded 2:1 like mu-law but with the
  *    even-bit wire inversion (XOR 0x55), 13-bit truncation, and no bias
  *    term — the European-telephony sibling, same stateless per-byte
  *    segment arithmetic;
  *  - format 7 — G.711 mu-law: genuinely COMPRESSED (companded 2:1)
  *    audio, expanded per sample with the public ITU G.711 segment
  *    arithmetic (sign / 3-bit exponent / 4-bit mantissa, bias 0x84) —
  *    stateless per byte, so an external oracle can replay
  *    compress∘expand exactly;
  *  - format 17 — IMA/DVI ADPCM: genuinely COMPRESSED (4:1) audio with
  *    adaptive quantization — per-block state (predictor + step index in
  *    the 4-byte block header), 4-bit nibbles decoded through the public
  *    89-entry step table and index-adjust table. Mono scope (fixture
  *    surface; stereo interleaves per-channel state words). The `fact`
  *    chunk's sample count trims encoder padding in the final block.
  *
  * None of these need a codec library — the "decode" is byte layout plus
  * arithmetic — so, like [[Png]] and [[Avi]], this path carries no fake
  * anywhere. The matching encoders synthesize spec-conformant fixtures.
  * Perceptual codecs (MP3/AAC/Opus) genuinely need codec libraries this
  * container lacks and stay behind [[Binary.decodeStub]].
  *
  * Reference behavior modeled on the media-bytes columns of
  * /root/reference/data_processing (multimodal payload plumbing); the
  * codec itself follows the public RIFF/WAVE + G.711 + IMA ADPCM layouts
  * only.
  */
object Wav {

  /** Decoded clip: interleaved samples, `channels` per frame. */
  final case class Clip(sampleRate: Int, channels: Int, samples: Array[Short])

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  // ---- G.711 mu-law (format 7) ----------------------------------------

  /** Expand one mu-law codeword to its 16-bit sample (ITU G.711: the
    * transmitted byte is the complement of sign|exp|mantissa). */
  private[multimodal] def ulawExpand(u: Int): Short = {
    val c = (~u) & 0xff
    val exp = (c >> 4) & 7
    val mant = c & 0x0f
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    (if ((c & 0x80) != 0) -mag else mag).toShort
  }

  /** Compress one 16-bit sample to its mu-law codeword (clip 32635,
    * bias 0x84, segment = position of the top magnitude bit). */
  private[multimodal] def ulawCompress(s: Int): Int = {
    val sign = if (s < 0) 0x80 else 0
    var x = if (s < 0) -s else s
    if (x > 32635) x = 32635
    x += 0x84
    var exp = 7
    while (exp > 0 && x < (1 << (exp + 7))) exp -= 1
    val mant = (x >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant)) & 0xff
  }

  // ---- G.711 A-law (format 6) -----------------------------------------

  /** Expand one A-law codeword to its 16-bit sample (ITU G.711: even bits
    * inverted on the wire — XOR 0x55 — then sign | 3-bit segment | 4-bit
    * mantissa; segment 0 is linear, higher segments shift the biased
    * mantissa). Unlike mu-law there is no bias subtraction: segment 0
    * reconstructs (mant<<4)+8, segment s>=1 reconstructs
    * ((mant<<4)+0x108)<<(s-1). Stateless per byte, so an external oracle
    * can replay compress∘expand exactly. */
  private[multimodal] def alawExpand(a0: Int): Short = {
    val a = (a0 ^ 0x55) & 0xff
    val seg = (a >> 4) & 7
    val mant = a & 0x0f
    val mag =
      if (seg == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (seg - 1)
    (if ((a & 0x80) != 0) mag else -mag).toShort
  }

  /** Compress one 16-bit sample to its A-law codeword: the 16-bit sample
    * is truncated to 13 bits (>>3, negatives folded via -x-1 so the
    * magnitude stays a floor division — no arithmetic-shift sign
    * special-casing), the segment is the position of the top magnitude
    * bit, and the wire byte XORs the 0x55 even-bit inversion (0xD5 for
    * positive = 0x55 | sign bit). */
  private[multimodal] def alawCompress(s: Int): Int = {
    val mask = if (s >= 0) 0xd5 else 0x55
    var m = if (s >= 0) s >> 3 else ((-s) - 1) >> 3
    if (m > 0xfff) m = 0xfff
    var seg = 0
    while (seg < 7 && m >= (0x20 << seg)) seg += 1
    val shift = if (seg < 2) 1 else seg
    val mant = (m >> shift) & 0x0f
    ((seg << 4) | mant) ^ mask
  }

  // ---- IMA/DVI ADPCM (format 17) --------------------------------------

  /** Public IMA ADPCM step-size table (89 entries) — public access: the
    * q96 oracle interpolates it into its replay SQL. */
  val AdpcmSteps: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Public IMA ADPCM index-adjust table (by 4-bit nibble). */
  private[multimodal] val AdpcmIndexAdj: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  private def clamp16(x: Int): Int =
    if (x < -32768) -32768 else if (x > 32767) 32767 else x

  private def clampIdx(x: Int): Int =
    if (x < 0) 0 else if (x > 88) 88 else x

  /** Decode one nibble against (pred, idx) state; returns the new state.
    * The reconstruction sum `step>>3 + bit-weighted step halves` is the
    * spec's integer approximation of (nibble+0.5)*step/4. */
  private[multimodal] def adpcmStep(nib: Int, pred: Int, idx: Int): (Int, Int) = {
    val step = AdpcmSteps(idx)
    var diffq = step >> 3
    if ((nib & 4) != 0) diffq += step
    if ((nib & 2) != 0) diffq += step >> 1
    if ((nib & 1) != 0) diffq += step >> 2
    val p = clamp16(if ((nib & 8) != 0) pred - diffq else pred + diffq)
    (p, clampIdx(idx + AdpcmIndexAdj(nib)))
  }

  /** Encode one sample against (pred, idx) state: successive
    * approximation of |sample - pred| by step, step/2, step/4. */
  private[multimodal] def adpcmEncodeNibble(sample: Int, pred: Int, idx: Int): Int = {
    val step = AdpcmSteps(idx)
    val diff = sample - pred
    var nib = if (diff < 0) 8 else 0
    var d = if (diff < 0) -diff else diff
    if (d >= step) { nib |= 4; d -= step }
    if (d >= (step >> 1)) { nib |= 2; d -= step >> 1 }
    if (d >= (step >> 2)) nib |= 1
    nib
  }

  /** Decode a RIFF/WAVE byte array to its PCM samples (expanding mu-law /
    * ADPCM payloads). Throws IllegalArgumentException on malformed or
    * unsupported input — the decode operator maps that to an `ok=false`
    * row, never a task failure. */
  def decode(wav: Array[Byte]): Clip = {
    require(wav.length >= 12 &&
      wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F' &&
      wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E',
      "not a WAV: bad RIFF/WAVE header")
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1; var fmtTag = -1
    var blockAlign = -1
    var factSamples = -1L
    var data: Array[Short] = null
    while (off + 8 <= wav.length && data == null) {
      val ctype = new String(wav, off, 4, "US-ASCII")
      val len = u32(wav, off + 4)
      require(len >= 0 && off + 8 + len <= wav.length,
        s"truncated WAV chunk $ctype")
      ctype match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short ($len)")
          fmtTag = u16(wav, off + 8)
          channels = u16(wav, off + 10)
          sampleRate = u32(wav, off + 12).toInt
          blockAlign = u16(wav, off + 20)
          bits = u16(wav, off + 22)
          fmtTag match {
            case 1 =>
              require(bits == 16, s"PCM bit depth $bits unsupported (16 only)")
            case 6 =>
              require(bits == 8, s"A-law bit depth $bits unsupported (8 only)")
            case 7 =>
              require(bits == 8, s"mu-law bit depth $bits unsupported (8 only)")
            case 17 =>
              require(bits == 4, s"ADPCM bit depth $bits unsupported (4 only)")
              require(channels == 1, "ADPCM stereo unsupported (mono only)")
              require(blockAlign > 4, s"ADPCM block align $blockAlign too small")
            case t =>
              throw new IllegalArgumentException(
                s"WAV format tag $t unsupported " +
                  "(PCM=1, A-law=6, mu-law=7, IMA ADPCM=17)")
          }
          require(channels > 0, "zero channels")
        case "fact" =>
          require(len >= 4, "fact chunk too short")
          factSamples = u32(wav, off + 8)
        case "data" =>
          require(fmtTag != -1, "data chunk before fmt chunk")
          val body = off + 8
          fmtTag match {
            case 1 =>
              val n = (len / 2).toInt
              val out = new Array[Short](n)
              var i = 0
              while (i < n) { out(i) = u16(wav, body + 2 * i).toShort; i += 1 }
              data = out
            case 6 =>
              val n = len.toInt
              val out = new Array[Short](n)
              var i = 0
              while (i < n) { out(i) = alawExpand(wav(body + i) & 0xff); i += 1 }
              data = out
            case 7 =>
              val n = len.toInt
              val out = new Array[Short](n)
              var i = 0
              while (i < n) { out(i) = ulawExpand(wav(body + i) & 0xff); i += 1 }
              data = out
            case 17 =>
              require(len % blockAlign == 0,
                s"ADPCM data ($len bytes) not a multiple of block align $blockAlign")
              val spb = (blockAlign - 4) * 2 + 1
              val nBlocks = (len / blockAlign).toInt
              val full = new Array[Short](nBlocks * spb)
              var b = 0
              while (b < nBlocks) {
                val base = body + b * blockAlign
                var pred = u16(wav, base).toShort.toInt // int16 predictor
                var idx = wav(base + 2) & 0xff
                require(idx <= 88, s"ADPCM step index $idx out of range")
                var k = b * spb
                full(k) = pred.toShort; k += 1
                var j = 0
                while (j < blockAlign - 4) {
                  val byte = wav(base + 4 + j) & 0xff
                  // low nibble first, then high
                  var h = 0
                  while (h < 2) {
                    val nib = if (h == 0) byte & 0x0f else (byte >> 4) & 0x0f
                    val (p, i2) = adpcmStep(nib, pred, idx)
                    pred = p; idx = i2
                    full(k) = p.toShort; k += 1
                    h += 1
                  }
                  j += 1
                }
                b += 1
              }
              // fact trims the encoder's final-block padding
              data =
                if (factSamples >= 0 && factSamples < full.length)
                  java.util.Arrays.copyOf(full, factSamples.toInt)
                else full
          }
        case _ => () // ancillary chunks (LIST, cue, ...) skipped
      }
      // chunks are word-aligned: odd-length chunks carry a pad byte
      off += 8 + len.toInt + (len % 2).toInt
    }
    require(data != null, "missing data chunk")
    Clip(sampleRate, channels, data)
  }

  /** Shared RIFF/WAVE scaffolding: header + fmt (+ optional fact) + data. */
  private def riff(fmtTag: Int, channels: Int, sampleRate: Int,
                   byteRate: Long, blockAlign: Int, bits: Int,
                   factSamples: Long, data: Array[Byte]): Array[Byte] = {
    val fact = factSamples >= 0
    val total = 12 + (8 + 16) + (if (fact) 8 + 4 else 0) + 8 + data.length
    val out = new Array[Byte](total)
    var p = 0
    def ascii(s: String): Unit =
      s.getBytes("US-ASCII").foreach { b => out(p) = b; p += 1 }
    def put16(v: Int): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte; p += 2
    }
    def put32(v: Long): Unit = {
      (0 until 4).foreach(i => out(p + i) = ((v >> (8 * i)) & 0xff).toByte)
      p += 4
    }
    ascii("RIFF"); put32(total - 8L); ascii("WAVE")
    ascii("fmt "); put32(16L)
    put16(fmtTag); put16(channels); put32(sampleRate.toLong)
    put32(byteRate); put16(blockAlign); put16(bits)
    if (fact) { ascii("fact"); put32(4L); put32(factSamples) }
    ascii("data"); put32(data.length.toLong)
    System.arraycopy(data, 0, out, p, data.length)
    out
  }

  /** Encode PCM samples as a RIFF/WAVE file (16-bit PCM, format 1). */
  def encode(clip: Clip): Array[Byte] = {
    val Clip(sampleRate, channels, samples) = clip
    require(channels > 0, "zero channels")
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    riff(1, channels, sampleRate, sampleRate.toLong * channels * 2,
      channels * 2, 16, -1L, data)
  }

  /** Encode samples as a G.711 A-law WAV (format 6): each 16-bit sample
    * compressed to one codeword. Lossy by design — decode yields the
    * expanded (companded) samples, not the input. */
  def encodeAlaw(clip: Clip): Array[Byte] = {
    val Clip(sampleRate, channels, samples) = clip
    require(channels > 0, "zero channels")
    val data = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) {
      data(i) = alawCompress(samples(i).toInt).toByte
      i += 1
    }
    riff(6, channels, sampleRate, sampleRate.toLong * channels,
      channels, 8, samples.length.toLong / channels, data)
  }

  /** Encode samples as a G.711 mu-law WAV (format 7): each 16-bit sample
    * compressed to one codeword. Lossy by design — decode yields the
    * expanded (companded) samples, not the input. */
  def encodeUlaw(clip: Clip): Array[Byte] = {
    val Clip(sampleRate, channels, samples) = clip
    require(channels > 0, "zero channels")
    val data = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) {
      data(i) = ulawCompress(samples(i).toInt).toByte
      i += 1
    }
    riff(7, channels, sampleRate, sampleRate.toLong * channels,
      channels, 8, samples.length.toLong / channels, data)
  }

  /** Encode mono samples as an IMA ADPCM WAV (format 17): blocks of
    * `blockAlign` bytes — 4-byte header (first sample verbatim + step
    * index) + 4-bit nibbles, low nibble first. The step index continues
    * across blocks; the final block is padded by holding the last sample
    * and the true count rides the `fact` chunk. Lossy by design. */
  def encodeAdpcm(clip: Clip, blockAlign: Int = 36): Array[Byte] = {
    val Clip(sampleRate, channels, samples) = clip
    require(channels == 1, "ADPCM encoder is mono-scope")
    require(blockAlign > 4 && blockAlign % 4 == 0,
      s"block align $blockAlign must be a positive multiple of 4")
    require(samples.nonEmpty, "empty clip")
    val spb = (blockAlign - 4) * 2 + 1
    val nBlocks = (samples.length + spb - 1) / spb
    val data = new Array[Byte](nBlocks * blockAlign)
    var idx = 0
    var b = 0
    while (b < nBlocks) {
      val base = b * blockAlign
      val s0 = b * spb
      def sampleAt(k: Int): Int = // hold last sample past the end (padding)
        samples(math.min(k, samples.length - 1)).toInt
      var pred = sampleAt(s0)
      data(base) = (pred & 0xff).toByte
      data(base + 1) = ((pred >> 8) & 0xff).toByte
      data(base + 2) = idx.toByte
      data(base + 3) = 0
      var j = 0
      while (j < blockAlign - 4) {
        var byte = 0
        var h = 0
        while (h < 2) {
          val target = sampleAt(s0 + 1 + j * 2 + h)
          val nib = adpcmEncodeNibble(target, pred, idx)
          val (p, i2) = adpcmStep(nib, pred, idx)
          pred = p; idx = i2
          byte |= (nib & 0x0f) << (4 * h) // low nibble first
          h += 1
        }
        data(base + 4 + j) = byte.toByte
        j += 1
      }
      b += 1
    }
    riff(17, 1, sampleRate, (sampleRate.toLong * blockAlign + spb - 1) / spb,
      blockAlign, 4, samples.length.toLong, data)
  }
}
