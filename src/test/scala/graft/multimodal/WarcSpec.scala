package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  private def rec(t: String, uri: String, body: String) =
    Warc.Record(t, s"<urn:uuid:${body.hashCode}>", uri,
      "2026-01-01T00:00:00Z", "text/plain", body.getBytes("UTF-8"))

  test("parse inverts encode over a multi-record file") {
    val rs = Seq(rec("warcinfo", "", "software: x\r\n"),
      rec("response", "http://a.co/1", "first body"),
      rec("response", "http://a.co/2", ""))
    val back = Warc.parse(rs.flatMap(Warc.encodeRecord).toArray)
    assert(back.map(_.warcType) === Seq("warcinfo", "response", "response"))
    assert(back.map(_.targetUri) === Seq("", "http://a.co/1", "http://a.co/2"))
    assert(back.map(r => new String(r.payload, "UTF-8")) ===
      Seq("software: x\r\n", "first body", ""))
  }

  test("payload framing is Content-Length-driven: CRLFCRLF in body is data") {
    val tricky = "line one\r\n\r\nWARC/1.0\r\nlooks like a record but is body"
    val back = Warc.parse(Warc.encodeRecord(rec("response", "http://x/", tricky)))
    assert(back.size === 1)
    assert(new String(back.head.payload, "UTF-8") === tricky)
  }

  test("warc.gz: member-per-record shards inflate and parse") {
    val rs = Seq(rec("response", "http://a.co/1", "alpha"),
      rec("response", "http://a.co/2", "beta"))
    val back = Warc.parse(Gzip.decode(Warc.encodeGz(rs)))
    assert(back.map(r => new String(r.payload, "UTF-8")) === Seq("alpha", "beta"))
  }

  test("header names are case-insensitive; unknown headers are kept out") {
    val raw = ("WARC/1.0\r\nwarc-type: response\r\nCONTENT-LENGTH: 4\r\n" +
      "X-Custom: whatever\r\nWaRc-TaRgEt-UrI: http://h/\r\n\r\nbody\r\n\r\n")
      .getBytes("UTF-8")
    val back = Warc.parse(raw)
    assert(back.head.warcType === "response")
    assert(back.head.targetUri === "http://h/")
    assert(new String(back.head.payload, "UTF-8") === "body")
  }

  test("malformed input throws: bad version, no length, truncation, no separator") {
    intercept[IllegalArgumentException](
      Warc.parse("HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8")))
    intercept[IllegalArgumentException](
      Warc.parse("WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n".getBytes("UTF-8")))
    intercept[IllegalArgumentException](
      Warc.parse("WARC/1.0\r\nContent-Length: 99\r\n\r\nshort\r\n\r\n".getBytes("UTF-8")))
    intercept[IllegalArgumentException](
      Warc.parse("WARC/1.0\r\nContent-Length: 4\r\n\r\nbody".getBytes("UTF-8")))
    intercept[IllegalArgumentException](
      Warc.parse("WARC/1.0\r\nContent-Length: nope\r\n\r\n\r\n\r\n".getBytes("UTF-8")))
  }

  test("warcRecords: per-record rows, digests, poison shard ok=false") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val good = Warc.encodeGz(Seq(rec("response", "http://a.co/1", "alpha")))
    val rows = Seq(
      Binary.MediaRow(1L, good, "text", "warc"),
      Binary.MediaRow(2L, Array[Byte](9, 9, 9), "text", "warc"))
    val out = Binary.warcRecords(rows.toDS()).collect().sortBy(_.media_id)
    assert(out.length === 2)
    assert(out(0).ok && out(0).target_uri === "http://a.co/1" &&
      out(0).n_payload === 5L)
    // md5("alpha")
    assert(out(0).digest === "2c1743a391305fbf367df8e4f069f9f9")
    assert(!out(1).ok && out(1).digest === null)
  }
}
