package graft.multimodal

/** Synthetic FLAC container encoder — the fixture half of the
  * `flac_meta` probe (graft.parse.FlacMetaExpr). Only the metadata
  * layer is real (magic, block chain, spec-exact STREAMINFO bit
  * packing); the "audio" after the last block is deterministic junk
  * the probe never reads (LPC subframe encoding is codec-library
  * territory — the established stub boundary). */
object Flac {

  /** Encode a container: STREAMINFO first (spec-mandated), then
    * optional VORBIS_COMMENT / SEEKTABLE / PADDING blocks, then
    * `audioBytes` of junk. */
  def encode(sampleRate: Int, channels: Int, bitsPerSample: Int,
             totalSamples: Long, tags: Boolean = false,
             seektable: Boolean = false, padding: Int = 0,
             audioBytes: Int = 64): Array[Byte] = {
    require(sampleRate >= 1 && sampleRate < (1 << 20))
    require(channels >= 1 && channels <= 8)
    require(bitsPerSample >= 4 && bitsPerSample <= 32)
    require(totalSamples >= 0 && totalSamples < (1L << 36))
    val bos = new java.io.ByteArrayOutputStream()
    bos.write('f'); bos.write('L'); bos.write('a'); bos.write('C')
    def blockHeader(tpe: Int, len: Int, last: Boolean): Unit = {
      bos.write((if (last) 0x80 else 0) | tpe)
      bos.write((len >> 16) & 0xff); bos.write((len >> 8) & 0xff)
      bos.write(len & 0xff)
    }
    val more = tags || seektable || padding > 0
    // STREAMINFO (34 bytes)
    blockHeader(0, 34, last = !more)
    bos.write(0x10); bos.write(0x00) // min blocksize 4096
    bos.write(0x10); bos.write(0x00) // max blocksize
    bos.write(0); bos.write(0); bos.write(0) // min framesize (unknown)
    bos.write(0); bos.write(0); bos.write(0) // max framesize
    // 20-bit rate | 3-bit ch-1 | 5-bit bps-1 | 36-bit total, MSB-first
    bos.write((sampleRate >> 12) & 0xff)
    bos.write((sampleRate >> 4) & 0xff)
    bos.write(((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >> 4))
    bos.write((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf).toInt)
    bos.write(((totalSamples >> 24) & 0xff).toInt)
    bos.write(((totalSamples >> 16) & 0xff).toInt)
    bos.write(((totalSamples >> 8) & 0xff).toInt)
    bos.write((totalSamples & 0xff).toInt)
    var i = 0
    while (i < 16) { bos.write((i * 11 + 3) % 256); i += 1 } // audio md5
    // VORBIS_COMMENT: minimal — 32-bit LE vendor length + vendor + count 0
    if (tags) {
      val vendor = "graft".getBytes("UTF-8")
      blockHeader(4, 4 + vendor.length + 4, last = !(seektable || padding > 0))
      bos.write(vendor.length); bos.write(0); bos.write(0); bos.write(0)
      bos.write(vendor)
      bos.write(0); bos.write(0); bos.write(0); bos.write(0)
    }
    // SEEKTABLE: one 18-byte placeholder point
    if (seektable) {
      blockHeader(3, 18, last = padding == 0)
      var j = 0
      while (j < 18) { bos.write((j * 5 + 1) % 256); j += 1 }
    }
    if (padding > 0) {
      blockHeader(1, padding, last = true)
      var j = 0
      while (j < padding) { bos.write(0); j += 1 }
    }
    i = 0
    while (i < audioBytes) { bos.write((i * 29 + 7) % 256); i += 1 }
    bos.toByteArray
  }
}
