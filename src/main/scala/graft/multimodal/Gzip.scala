package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

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
    * does any malformed/truncated input. */
  def decode(gz: Array[Byte], maxOut: Int = 1 << 26): Array[Byte] = {
    require(gz.length >= 2 && (gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b,
      "not gzip: bad magic")
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(gz))
      val out = new ByteArrayOutputStream(math.min(gz.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size().toLong + n > maxOut)
          throw new IllegalArgumentException(
            s"gzip output exceeds cap $maxOut (zip bomb?)")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close()
      out.toByteArray
    } catch {
      case e: java.io.IOException =>
        throw new IllegalArgumentException(s"malformed gzip: ${e.getMessage}")
    }
  }
}
