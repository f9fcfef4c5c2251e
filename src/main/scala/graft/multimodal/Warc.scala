package graft.multimodal

/** WARC (Web ARChive, ISO 28500) container codec — the on-disk format of
  * every public web crawl: a WARC file is a sequence of records, each a
  * version line (`WARC/1.0`), CRLF-terminated named headers, an empty
  * line, exactly `Content-Length` payload bytes, and a `CRLF CRLF`
  * separator. The `.warc.gz` convention compresses EACH RECORD as its own
  * gzip member so readers can seek to a record without inflating the
  * file; concatenated members are valid gzip, so [[Gzip.decode]] inflates
  * a whole shard in one call and [[parse]] walks the records.
  *
  * Parsing discipline: the payload is sized by `Content-Length` ONLY —
  * never by scanning for a separator — so payloads containing `CRLF CRLF`
  * (any HTML body) can never desynchronize the walk; header names are
  * case-insensitive per the spec; malformed input (bad version line,
  * missing Content-Length, truncated payload, missing separator) throws
  * IllegalArgumentException, which the decode operator maps to `ok=false`
  * rows, never task failures (the [[Png]] poison contract).
  *
  * Reference behavior: the reference ingests pre-extracted CSV
  * (data_ingestion/upload_to_MinIO/ingest_data_to_datalake.py); a crawl
  * pipeline meets WARC one step earlier, so the engine carries the
  * container walk (BASELINE.json LLM-ops scope). Encoder synthesizes
  * spec-conformant fixtures like every codec here.
  */
object Warc {

  /** One WARC record: the standard headers + raw payload bytes. */
  final case class Record(warcType: String, recordId: String,
                          targetUri: String, date: String,
                          contentType: String, payload: Array[Byte])

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Parse a (decompressed) WARC byte stream into its records. */
  def parse(warc: Array[Byte]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    var off = 0
    // read one CRLF-terminated line; returns (line, offsetAfter)
    def line(from: Int): (String, Int) = {
      var i = from
      while (i + 1 < warc.length && !(warc(i) == '\r' && warc(i + 1) == '\n'))
        i += 1
      require(i + 1 < warc.length, "truncated WARC: unterminated line")
      (new String(warc, from, i - from, "UTF-8"), i + 2)
    }
    while (off < warc.length) {
      val (version, afterVersion) = line(off)
      require(version.startsWith("WARC/"),
        s"not a WARC record at offset $off: '${version.take(20)}'")
      var headers = Map.empty[String, String]
      var p = afterVersion
      var done = false
      while (!done) {
        val (h, next) = line(p)
        p = next
        if (h.isEmpty) done = true
        else {
          val i = h.indexOf(':')
          require(i > 0, s"malformed WARC header '$h'")
          // header names are case-insensitive (ISO 28500 §4)
          headers += h.take(i).toLowerCase -> h.drop(i + 1).trim
        }
      }
      val len = headers.getOrElse("content-length",
        throw new IllegalArgumentException("WARC record missing Content-Length"))
      val n =
        try len.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(s"bad Content-Length '$len'") }
      require(n >= 0 && p + n <= warc.length,
        s"truncated WARC payload (need $n bytes at $p of ${warc.length})")
      val payload = java.util.Arrays.copyOfRange(warc, p, p + n)
      p += n
      // record separator: two CRLFs after the payload
      require(p + 4 <= warc.length &&
        warc(p) == '\r' && warc(p + 1) == '\n' &&
        warc(p + 2) == '\r' && warc(p + 3) == '\n',
        "WARC record missing CRLF CRLF separator")
      p += 4
      out += Record(
        headers.getOrElse("warc-type", ""),
        headers.getOrElse("warc-record-id", ""),
        headers.getOrElse("warc-target-uri", ""),
        headers.getOrElse("warc-date", ""),
        headers.getOrElse("content-type", ""),
        payload)
      off = p
    }
    out.result()
  }

  /** Encode one record (spec-conformant; fixture synthesis). */
  def encodeRecord(r: Record): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(r.warcType).append("\r\n")
    if (r.recordId.nonEmpty)
      sb.append("WARC-Record-ID: ").append(r.recordId).append("\r\n")
    if (r.targetUri.nonEmpty)
      sb.append("WARC-Target-URI: ").append(r.targetUri).append("\r\n")
    if (r.date.nonEmpty)
      sb.append("WARC-Date: ").append(r.date).append("\r\n")
    if (r.contentType.nonEmpty)
      sb.append("Content-Type: ").append(r.contentType).append("\r\n")
    sb.append("Content-Length: ").append(r.payload.length).append("\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes("UTF-8")
    head ++ r.payload ++ Crlf ++ Crlf
  }

  /** Encode records as a `.warc.gz` shard: each record its own gzip
    * member, members concatenated (the crawl convention). Members stream
    * into one buffer — a foldLeft over `++` re-copies the accumulated
    * prefix per member, which is QUADRATIC in shard size (measured 21×
    * wall at 10× docs before this was a stream). */
  def encodeGz(records: Seq[Record]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(records.size * 256 + 64)
    records.foreach(r => bos.write(Gzip.encode(encodeRecord(r))))
    bos.toByteArray
  }
}
