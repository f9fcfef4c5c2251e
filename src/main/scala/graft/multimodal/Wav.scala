package graft.multimodal

/** Pure-JVM RIFF/WAVE PCM codec — a REAL sample decoder (not a stub):
  * chunk walk (fmt/data, ancillary chunks skipped) + little-endian PCM
  * sample extraction. PCM needs no codec library — the "decode" is byte
  * layout plus arithmetic — so, like [[Png]], this path carries no fake
  * anywhere. The matching encoder synthesizes spec-conformant fixtures.
  *
  * SCOPE: integer PCM (format tag 1), 16-bit samples, any channel count /
  * sample rate. Float PCM (tag 3), ADPCM, and other bit depths throw with
  * a clear message — compressed audio (MP3/AAC/Opus) genuinely needs a
  * codec and stays behind [[Binary.decodeStub]]'s execution-shape stub.
  *
  * Reference behavior modeled on the media-bytes columns of
  * /root/reference/data_processing (multimodal payload plumbing); the
  * codec itself follows the public RIFF/WAVE layout only.
  */
object Wav {

  /** Decoded clip: interleaved samples, `channels` per frame. */
  final case class Clip(sampleRate: Int, channels: Int, samples: Array[Short])

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Decode a RIFF/WAVE byte array to its PCM samples. Throws
    * IllegalArgumentException on malformed/unsupported input — the decode
    * operator maps that to an `ok=false` row, never a task failure. */
  def decode(wav: Array[Byte]): Clip = {
    require(wav.length >= 12 &&
      wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F' &&
      wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E',
      "not a WAV: bad RIFF/WAVE header")
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1; var fmtTag = -1
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
          bits = u16(wav, off + 22)
          require(fmtTag == 1, s"WAV format tag $fmtTag unsupported (PCM=1 only)")
          require(bits == 16, s"bit depth $bits unsupported (16 only)")
          require(channels > 0, "zero channels")
        case "data" =>
          require(fmtTag == 1, "data chunk before fmt chunk")
          val n = (len / 2).toInt
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = u16(wav, off + 8 + 2 * i).toShort
            i += 1
          }
          data = out
        case _ => () // ancillary chunks (LIST, cue, ...) skipped
      }
      // chunks are word-aligned: odd-length chunks carry a pad byte
      off += 8 + len.toInt + (len % 2).toInt
    }
    require(data != null, "missing data chunk")
    Clip(sampleRate, channels, data)
  }

  /** Encode PCM samples as a RIFF/WAVE file (16-bit PCM). */
  def encode(clip: Clip): Array[Byte] = {
    val Clip(sampleRate, channels, samples) = clip
    require(channels > 0, "zero channels")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => out(off + i) = b }
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(off: Int, v: Long): Unit = (0 until 4).foreach { i =>
      out(off + i) = ((v >> (8 * i)) & 0xff).toByte
    }
    putAscii(0, "RIFF"); put32(4, 36L + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16L)
    put16(20, 1) // PCM
    put16(22, channels)
    put32(24, sampleRate.toLong)
    put32(28, sampleRate.toLong * channels * 2) // byte rate
    put16(32, channels * 2) // block align
    put16(34, 16) // bits per sample
    putAscii(36, "data"); put32(40, dataLen.toLong)
    samples.zipWithIndex.foreach { case (s, i) => put16(44 + 2 * i, s & 0xffff) }
    out
  }
}
