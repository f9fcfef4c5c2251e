package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma", 16L),
    (2L, "delta", 5L),
    (3L, (null: String), 0L),
    (4L, "  spaced   out  ", 16L),
    (5L, "epsilon zeta", 12L)
  ).toDF("doc_id", "text", "n_chars")

  test("assign: deterministic, in-range, partitioning-invariant") {
    val a = Shards.assign(docs, "doc_id", nShards = 4)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val b = Shards.assign(docs.repartition(7), "doc_id", nShards = 4)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a.values.forall(s => s >= 0 && s < 4))
  }

  test("manifest: counts, token/byte mass, id ranges add up to the corpus") {
    val m = Shards.manifest(Shards.assign(docs, "doc_id", 4),
      "doc_id", "text", "n_chars").collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum === 5L)
    // tokens: 3 + 1 + 0(null) + 2 + 2
    assert(m.map(_.getAs[Long]("n_tokens")).sum === 8L)
    assert(m.map(_.getAs[Long]("n_chars")).sum === 49L)
    assert(m.map(_.getAs[Long]("min_id")).min === 1L)
    assert(m.map(_.getAs[Long]("max_id")).max === 5L)
  }

  test("checksum: order-free, and a dropped or mutated row breaks it") {
    def sums(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Shards.manifest(Shards.assign(df, "doc_id", 2), "doc_id", "text",
          "n_chars")
        .select("shard", "checksum").as[(Long, Long)].collect().toMap
    val base = sums(docs)
    assert(sums(docs.orderBy(desc("doc_id"))) === base)
    val dropped = sums(docs.filter(col("doc_id") =!= 2L))
    assert(dropped !== base)
    val mutated = sums(docs.withColumn("n_chars",
      when(col("doc_id") === 2L, 6L).otherwise(col("n_chars"))))
    assert(mutated !== base)
  }
}
