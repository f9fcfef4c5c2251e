package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, GZIPOutputStream, Inflater}

/** Gzip (RFC 1952) member codec — the compression wrapper around
  * essentially every crawl corpus (WET/WARC records, .jsonl.gz shards,
  * log archives ship gzipped). Unlike the image/audio codecs this rides
  * the JDK's built-in zlib — gzip is in `java.util.zip`, no external
  * codec library — so, like [[Png]]'s inflate, the decode is REAL.
  *
  * [[decode]] handles multi-member streams (concatenated gzip files are
  * themselves valid gzip — the standard way crawl shards are built, and
  * `GZIPInputStream` walks members natively) and carries a decompressed
  * size cap: a 100-byte zip bomb can inflate without bound, and a
  * decompression cap is the standard containment (the [[Png]]
  * poison-input lesson: never let attacker-controlled bytes size an
  * allocation). Malformed input throws IllegalArgumentException, which
  * the decode operators map to `ok=false` rows, never task failures.
  *
  * Reference behavior: the reference reads already-decompressed CSV
  * (data_ingestion/upload_to_MinIO/ingest_data_to_datalake.py); at crawl
  * scale the same ingest meets gzip at the first byte, so the engine
  * carries the codec (BASELINE.json LLM-ops scope).
  */
object Gzip {

  /** Compress bytes as a single gzip member. */
  def encode(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(data)
    gz.close()
    bos.toByteArray
  }

  /** Decompress a (possibly multi-member) gzip stream. `maxOut` caps the
    * decompressed size — exceeding it throws (zip-bomb containment), as
    * does any malformed/truncated input.
    *
    * Members are walked explicitly with `Inflater` rather than through
    * `GZIPInputStream`: the JDK stream treats a malformed header on a
    * SUBSEQUENT concatenated member as a clean end-of-stream, so a
    * corrupt trailing member in a multi-member shard would return
    * partial output with no error. Here every input byte must belong to
    * a well-formed member (header, deflate body, CRC32+ISIZE trailer) —
    * trailing garbage or a truncated member throws. */
  def decode(gz: Array[Byte], maxOut: Int = 1 << 26): Array[Byte] = {
    require(gz.length >= 2 && (gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b,
      "not gzip: bad magic")
    val out = new ByteArrayOutputStream(math.min(gz.length * 4, 1 << 16))
    var off = 0
    try {
      while (off < gz.length) off = decodeMember(gz, off, out, maxOut)
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"malformed gzip: ${e.getMessage}")
    }
    out.toByteArray
  }

  private def u8(b: Array[Byte], i: Int): Int = {
    if (i < 0 || i >= b.length)
      throw new IllegalArgumentException("malformed gzip: truncated")
    b(i) & 0xff
  }

  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** Decode one RFC 1952 member starting at `off0`; append its payload to
    * `out`, verify CRC32 + ISIZE, and return the offset just past its
    * trailer. */
  private def decodeMember(gz: Array[Byte], off0: Int,
                           out: ByteArrayOutputStream, maxOut: Int): Int = {
    var off = off0
    if (u8(gz, off) != 0x1f || u8(gz, off + 1) != 0x8b)
      throw new IllegalArgumentException(
        "malformed gzip: trailing bytes are not a gzip member")
    if (u8(gz, off + 2) != 8)
      throw new IllegalArgumentException(
        s"malformed gzip: unsupported compression method ${u8(gz, off + 2)}")
    val flg = u8(gz, off + 3)
    off += 10 // ID1 ID2 CM FLG MTIME(4) XFL OS
    if ((flg & 4) != 0) { // FEXTRA
      val xlen = u8(gz, off) | (u8(gz, off + 1) << 8); off += 2 + xlen
    }
    if ((flg & 8) != 0) { while (u8(gz, off) != 0) off += 1; off += 1 } // FNAME
    if ((flg & 16) != 0) { while (u8(gz, off) != 0) off += 1; off += 1 } // FCOMMENT
    if ((flg & 2) != 0) off += 2 // FHCRC
    if (off > gz.length)
      throw new IllegalArgumentException("malformed gzip: truncated header")
    val inf = new Inflater(true)
    try {
      inf.setInput(gz, off, gz.length - off)
      val crc = new CRC32
      val buf = new Array[Byte](8192)
      var memberLen = 0L
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput())
          throw new IllegalArgumentException(
            "malformed gzip: truncated deflate stream")
        if (out.size().toLong + n > maxOut)
          throw new IllegalArgumentException(
            s"gzip output exceeds cap $maxOut (zip bomb?)")
        out.write(buf, 0, n)
        crc.update(buf, 0, n)
        memberLen += n
      }
      off += inf.getBytesRead.toInt
      if (off + 8 > gz.length)
        throw new IllegalArgumentException("malformed gzip: truncated trailer")
      if (le32(gz, off) != crc.getValue)
        throw new IllegalArgumentException("malformed gzip: CRC32 mismatch")
      if (le32(gz, off + 4) != (memberLen & 0xffffffffL))
        throw new IllegalArgumentException("malformed gzip: ISIZE mismatch")
      off + 8
    } finally inf.end()
  }
}
