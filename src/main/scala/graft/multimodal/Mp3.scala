package graft.multimodal

import graft.parse.MpegAudioMetaExpr

/** Synthetic MPEG-audio (MP3-family) stream encoder — the fixture half
  * of the `mpeg_audio_meta` probe (graft.parse.MpegAudioMetaExpr).
  * Only the container/header layer is real: valid 4-byte frame headers
  * at the exact lengths the public ISO 11172-3 / 13818-3 formulas
  * dictate, with deterministic junk payloads (actual MDCT audio
  * synthesis is codec-library territory — the established stub
  * boundary; the probe never reads payload bytes). Optional leading
  * ID3v2 tag (syncsafe size, footer flag) and trailing 128-byte ID3v1
  * tag bracket the frames exactly as real files do. */
object Mp3 {

  /** Encode `brIdxs.size` frames. `verId` is the 2-bit header version
    * field (3 = MPEG-1, 2 = MPEG-2, 0 = MPEG-2.5), `layer` 1/2/3,
    * `brIdxs` per-frame bitrate indices (1..14 — varying them makes a
    * VBR stream), `srIdx` 0..2, `pad(frameIdx)` the padding bit.
    * `id3v2` adds a leading tag of that many payload bytes. */
  def encode(verId: Int, layer: Int, brIdxs: Seq[Int], srIdx: Int,
             mono: Boolean, pad: Int => Int = _ % 2,
             id3v2: Option[Int] = None, id3v2Footer: Boolean = false,
             id3v1: Boolean = false): Array[Byte] = {
    require(verId == 3 || verId == 2 || verId == 0, s"bad verId $verId")
    require(layer >= 1 && layer <= 3)
    require(srIdx >= 0 && srIdx <= 2)
    require(brIdxs.nonEmpty && brIdxs.forall(i => i >= 1 && i <= 14))
    val bos = new java.io.ByteArrayOutputStream()
    id3v2.foreach { sz =>
      require(sz >= 0 && sz < (1 << 28))
      bos.write('I'); bos.write('D'); bos.write('3')
      bos.write(4); bos.write(0) // v2.4.0
      bos.write(if (id3v2Footer) 0x10 else 0)
      bos.write((sz >> 21) & 0x7f); bos.write((sz >> 14) & 0x7f)
      bos.write((sz >> 7) & 0x7f); bos.write(sz & 0x7f)
      var i = 0
      while (i < sz) { bos.write((i * 17 + 5) % 256); i += 1 }
      if (id3v2Footer) {
        bos.write('3'); bos.write('D'); bos.write('I')
        bos.write(4); bos.write(0); bos.write(0x10)
        bos.write((sz >> 21) & 0x7f); bos.write((sz >> 14) & 0x7f)
        bos.write((sz >> 7) & 0x7f); bos.write(sz & 0x7f)
      }
    }
    val vRow = if (verId == 3) 0 else 1
    val sr = MpegAudioMetaExpr.Hz(verId)(srIdx)
    brIdxs.zipWithIndex.foreach { case (brIdx, f) =>
      val p = pad(f) & 1
      val br = MpegAudioMetaExpr.Kbps(vRow)(layer - 1)(brIdx - 1) * 1000
      val frameLen =
        if (layer == 1) (12 * br / sr + p) * 4
        else if (layer == 2 || verId == 3) 144 * br / sr + p
        else 72 * br / sr + p
      bos.write(0xff)
      bos.write(0xe0 | (verId << 3) | ((4 - layer) << 1) | 1) // no CRC
      bos.write((brIdx << 4) | (srIdx << 2) | (p << 1))
      bos.write((if (mono) 3 else 0) << 6)
      var j = 4
      while (j < frameLen) { bos.write((f * 31 + j) % 256); j += 1 }
    }
    if (id3v1) {
      bos.write('T'); bos.write('A'); bos.write('G')
      var i = 0
      while (i < 125) { bos.write((i * 7 + 1) % 256); i += 1 }
    }
    bos.toByteArray
  }
}
