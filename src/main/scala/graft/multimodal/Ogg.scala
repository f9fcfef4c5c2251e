package graft.multimodal

import java.io.ByteArrayOutputStream

/** Ogg container support — the page-level layout under Vorbis/Opus
  * audio (podcast/speech corpora, Wikipedia media dumps ship .ogg/
  * .opus). Codec payloads (Vorbis MDCT, Opus SILK/CELT) are codec-
  * library territory — the engine's established stub boundary; the
  * CONTAINER is public-spec byte layout: 27-byte page headers
  * ("OggS", version 0, type flags, 64-bit granule position, stream
  * serial, page sequence, CRC, segment lacing table), and the first
  * page of a logical stream carries the codec identification header
  * (Vorbis: the 30-byte type-1 ident packet; Opus: the 19-byte
  * OpusHead). This file holds the fixture/sink ENCODER and the page
  * CRC; the probe kernel lives in [[graft.parse.OggMetaExpr]].
  *
  * The Ogg page CRC is CRC-32 with polynomial 0x04C11DB7, zero
  * initial value, no bit reflection and no final XOR (distinct from
  * zlib's reflected CRC-32) — computed over the whole page with the
  * CRC field zeroed. */
object Ogg {

  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** Ogg page CRC-32 (forward, init 0, no xorout). */
  def crc32(b: Array[Byte], off: Int, len: Int): Int = {
    var r = 0
    var i = off
    val end = off + len
    while (i < end) {
      r = (r << 8) ^ crcTable(((r >>> 24) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    r
  }

  /** Build the 30-byte Vorbis identification header (packet type 1). */
  def vorbisIdent(channels: Int, sampleRate: Int): Array[Byte] = {
    val b = new Array[Byte](30)
    b(0) = 1
    "vorbis".getBytes("US-ASCII").copyToArray(b, 1)
    // version 0 (bytes 7..10 already zero)
    b(11) = channels.toByte
    var i = 0
    while (i < 4) { b(12 + i) = ((sampleRate >> (8 * i)) & 0xff).toByte; i += 1 }
    b(28) = ((6 << 4) | 6).toByte // blocksizes log2 (64/64 — legal pair)
    b(29) = 1 // framing bit
    b
  }

  /** Build the 19-byte OpusHead identification header (version 1). */
  def opusHead(channels: Int, preSkip: Int, inputRate: Int): Array[Byte] = {
    val b = new Array[Byte](19)
    "OpusHead".getBytes("US-ASCII").copyToArray(b, 0)
    b(8) = 1
    b(9) = channels.toByte
    b(10) = (preSkip & 0xff).toByte; b(11) = ((preSkip >> 8) & 0xff).toByte
    var i = 0
    while (i < 4) { b(12 + i) = ((inputRate >> (8 * i)) & 0xff).toByte; i += 1 }
    // gain 0, mapping family 0 (already zero)
    b
  }

  private def writePage(bos: ByteArrayOutputStream, headerType: Int,
                        granule: Long, serial: Int, seq: Int,
                        payload: Array[Byte]): Unit = {
    // proper lacing: 255-valued bytes for each full 255 run, then the
    // remainder (a multiple-of-255 payload ends with a 0 lacing byte)
    val lacing = {
      val full = payload.length / 255
      val rem = payload.length % 255
      val l = new Array[Byte](full + 1)
      java.util.Arrays.fill(l, 0, full, 0xff.toByte)
      l(full) = rem.toByte
      l
    }
    val page = new Array[Byte](27 + lacing.length + payload.length)
    "OggS".getBytes("US-ASCII").copyToArray(page, 0)
    page(4) = 0
    page(5) = headerType.toByte
    var i = 0
    while (i < 8) { page(6 + i) = ((granule >> (8 * i)) & 0xff).toByte; i += 1 }
    i = 0
    while (i < 4) { page(14 + i) = ((serial >> (8 * i)) & 0xff).toByte; i += 1 }
    i = 0
    while (i < 4) { page(18 + i) = ((seq >> (8 * i)) & 0xff).toByte; i += 1 }
    page(26) = lacing.length.toByte
    lacing.copyToArray(page, 27)
    payload.copyToArray(page, 27 + lacing.length)
    val crc = crc32(page, 0, page.length)
    i = 0
    while (i < 4) { page(22 + i) = ((crc >> (8 * i)) & 0xff).toByte; i += 1 }
    bos.write(page)
  }

  /** Assemble a single-logical-stream Ogg file: a BOS page carrying
    * `ident`, `nBody` junk body pages (deterministic bytes from
    * `seed`), and an EOS page at `lastGranule`. `nBody = -1` emits the
    * single-page degenerate stream (BOS|EOS on one page). */
  def encode(ident: Array[Byte], nBody: Int, lastGranule: Long,
             serial: Int, seed: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    if (nBody < 0) {
      writePage(bos, 0x02 | 0x04, lastGranule, serial, 0, ident)
      return bos.toByteArray
    }
    writePage(bos, 0x02, 0L, serial, 0, ident)
    var p = 0
    while (p < nBody) {
      val len = (31 + ((seed + p * 131) % 400)).toInt // crosses the 255 lacing run
      val body = Array.tabulate(len)(i => ((seed + i * 31 + p) % 256).toByte)
      val g = lastGranule * (p + 1) / (nBody + 1)
      writePage(bos, 0, g, serial, p + 1, body)
      p += 1
    }
    writePage(bos, 0x04, lastGranule, serial, nBody + 1,
      Array.tabulate(17)(i => ((seed + i) % 256).toByte))
    bos.toByteArray
  }
}
