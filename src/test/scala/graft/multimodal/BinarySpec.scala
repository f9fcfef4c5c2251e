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
}
