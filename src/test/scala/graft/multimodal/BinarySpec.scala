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
