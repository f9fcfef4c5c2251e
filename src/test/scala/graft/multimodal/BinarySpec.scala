package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BinarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = {
    val docs = Seq((1L, "hello world"), (2L, "PNG-ish payload")).toDF("doc_id", "text")
    Binary.mediaFromDocuments(spark, docs)
  }

  test("metadata: byte length, digest, magic bytes — no decode needed") {
    val out = Binary.withMetadata(media.toDF(), "payload")
      .select("media_id", "n_bytes", "magic")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 11L, "68656C6C")))          // "hell"
    assert(out(1)._2 === 15L)
  }

  test("modality sniffing from magic bytes") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 1, 2, 3, 4)
    val jpg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 0, 0, 0, 0, 0, 0, 0, 0)
    val wav = "RIFF1234WAVEfmt ".getBytes
    val mp4 = Array[Byte](0, 0, 0, 0x18) ++ "ftypisom1234".getBytes
    val txt = "plain text".getBytes
    val df = Seq(("png", png), ("jpg", jpg), ("wav", wav), ("mp4", mp4), ("txt", txt))
      .toDF("k", "payload")
    val out = df.select(col("k"), Binary.sniffModality(col("payload")))
      .as[(String, String)].collect().toMap
    assert(out === Map("png" -> "image/png", "jpg" -> "image/jpeg",
      "wav" -> "audio/wav", "mp4" -> "video/mp4", "txt" -> "unknown"))
  }

  test("media_meta parses real PNG and WAV headers; garbage is 'unknown'") {
    // hand-built valid headers, byte-for-byte per the format specs
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++
      Array[Byte](8, 6) // bit depth 8, RGBA
    val wav = "RIFF".getBytes ++ le32(1000) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(176400) ++ le16(4) ++ le16(16)
    val garbage = "definitely not media".getBytes
    val truncatedPng = png.take(20) // signature ok, IHDR cut off
    val out = Seq((1L, png), (2L, wav), (3L, garbage), (4L, truncatedPng))
      .toDF("id", "payload")
      .select(col("id"), Binary.mediaMeta(col("payload")).as("m"))
      .select("id", "m.kind", "m.width", "m.height", "m.channels", "m.sample_rate")
      .as[(Long, String, Option[Int], Option[Int], Option[Int], Option[Int])]
      .collect().sortBy(_._1).toSeq
    assert(out(0) === ((1L, "png", Some(640), Some(480), Some(4), None)))
    assert(out(1) === ((2L, "wav", None, None, Some(2), Some(44100))))
    assert(out(2) === ((3L, "unknown", None, None, None, None)))
    assert(out(3) === ((4L, "unknown", None, None, None, None)))
  }

  test("frame sampling stub: strided windows, bounded tails, explode shape") {
    val frames = Binary.frameSampleStub(media, frameBytes = 4, stride = 2)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    // doc 1: 11 bytes -> floor(11/4)=2 full frames, stride 2 hits idx 0;
    // doc 2: 15 bytes -> 3 frames, stride hits idx 0 and 2
    assert(frames.map(f => (f.media_id, f.frame_idx)).toSeq
      === Seq((1L, 0), (2L, 0), (2L, 2)))
    assert(frames.forall(_.frame.length <= 4))
    assert(new String(frames.head.frame) === "hell")
  }

  test("decode stub: deterministic fixed-width features, batch shape preserved") {
    val f1 = Binary.decodeStub(media, dim = 8).collect().sortBy(_.media_id)
    val f2 = Binary.decodeStub(media, dim = 8).collect().sortBy(_.media_id)
    assert(f1.length === 2)
    assert(f1.forall(_.feature.length === 8))
    assert(f1.map(_.feature.toSeq).toSeq === f2.map(_.feature.toSeq).toSeq)
    assert(f1(0).n_bytes === 11L)
    // features bounded as documented
    assert(f1.flatMap(_.feature).forall(v => v >= -1.0f && v < 1.0f))
  }

  test("videoFrames: real AVI decode, stride sampling, luma stats, poison") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // 2x1 frames with known RGB: luma = (299r + 587g + 114b) / 1000
    def frame(rgb: (Int, Int, Int)*): Array[Byte] =
      rgb.flatMap { case (r, g, b) => Seq(r.toByte, g.toByte, b.toByte) }.toArray
    val v = Avi.Video(2, 1, Array(
      frame((255, 0, 0), (0, 0, 0)),    // lumas 76, 0
      frame((0, 255, 0), (0, 0, 255)),  // lumas 149, 114 (skipped, stride 2)
      frame((10, 10, 10), (20, 20, 20)) // lumas 10, 20
    ))
    val rows = Seq(
      Binary.MediaRow(1L, Avi.encode(v), "video", "avi"),
      Binary.MediaRow(2L, Array[Byte](9, 9, 9), "video", "avi"))
    val out = Binary.videoFrames(rows.toDS(), stride = 2).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    val good = out.filter(_.ok)
    assert(good.map(f => (f.frame_idx, f.luma_sum, f.luma_min, f.luma_max)).toSeq
      === Seq((0, 76L, 0L, 76L), (2, 30L, 10L, 20L)))
    assert(good.forall(f => f.width == 2 && f.height == 1))
    assert(out.exists(r => !r.ok && r.media_id === 2L))
  }
}
