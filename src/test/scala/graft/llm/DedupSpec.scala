package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingles: k > token count falls back to whole-doc shingle") {
    val out = Seq("one two").toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("s")).as[Seq[String]].head()
    assert(out === Seq("one two"))
  }

  test("jaccard: identical sets -> 1.0, disjoint -> 0.0, both empty -> 1.0") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq.empty[String])).toDF("a", "b")
    val out = df.select(Dedup.jaccard(col("a"), col("b"))).as[Double].collect()
    assert(out.toSeq === Seq(1.0, 0.0, 1.0))
  }

  test("minhash LSH finds an exact duplicate pair and skips unrelated docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words about spark catalyst optimizer plans"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("simhash: identical docs -> hamming 0; different docs -> > 0") {
    val df = Seq(
      ("same text here", "same text here"),
      ("same text here", "totally other content words")).toDF("x", "y")
    val out = df.select(
      Dedup.hamming(Dedup.simhash(col("x")), Dedup.simhash(col("y"))))
      .as[Long].collect()
    assert(out(0) === 0L && out(1) > 0L)
  }

  test("minhash signature is deterministic across evaluations") {
    val df = Seq("alpha beta gamma delta epsilon zeta").toDF("t")
      .select(Dedup.shingles(col("t"), 2).as("s"))
    val s1 = df.select(Dedup.minhashSignature(col("s"), 8)).as[Seq[Long]].head()
    val s2 = df.select(Dedup.minhashSignature(col("s"), 8)).as[Seq[Long]].head()
    assert(s1 === s2 && s1.length === 8)
  }
}
