package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def asMap(df: DataFrame): Map[(Long, String), Long] =
    df.select(col("doc_id"), col("source"), col("pack_id"))
      .as[(Long, String, Long)].collect()
      .map { case (i, s, p) => (i, s) -> p }.toMap

  /** Both formulations on the same input must be row-identical. */
  private def assertPathsAgree(df: DataFrame, budget: Long,
                               ranges: Int = -1): Unit = {
    val windowed = asMap(
      Pack.packWindowed(df, "doc_id", "source", "n_tokens", budget))
    val dist = asMap(
      Pack.packSequences(df, "doc_id", "source", "n_tokens", budget, ranges))
    assert(dist === windowed)
  }

  private def synth(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.toDF("doc_id", "source", "n_tokens")

  test("distributed prefix sum equals the windowed ground truth (fixture)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"),
        coalesce(TextStats.tokenCount(col("text")).cast("long"), lit(0L))
          .as("n_tokens"))
    assertPathsAgree(docs, budget = 2048)
  }

  test("single hot source: 5000 docs, every ranges setting agrees") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 5000L).map(i => (i, "s0", rnd.nextInt(400).toLong))
    for (ranges <- Seq(1, 2, 7, 32))
      assertPathsAgree(synth(rows), budget = 1000, ranges = ranges)
  }

  test("the local cumsum window partitions by (source, range), not source alone") {
    val rows = (0L until 1000L).map(i => (i, "only", 10L))
    val plan = Pack.packSequences(synth(rows), "doc_id", "source",
        "n_tokens", budget = 100, ranges = 8)
      .queryExecution.optimizedPlan.toString
    // the per-row window must key on the range bucket — a plan that
    // windows on source alone has re-introduced the one-task-per-source
    // bottleneck this operator exists to remove
    assert(plan.contains("__rng"),
      s"expected range-bucketed window in plan:\n$plan")
  }

  test("sparse and adversarial shapes: gaps, singletons, zero tokens, exact boundaries") {
    // id gaps (buckets of uneven population), a singleton source, zero-token
    // docs, and token counts that land exactly on pack boundaries
    val rows = Seq[(Long, String, Long)](
      (1L, "a", 512L), (5L, "a", 512L), (900L, "a", 1024L), (901L, "a", 1L),
      (3L, "b", 0L), (4L, "b", 0L), (999999999L, "b", 2048L),
      (42L, "c", 5000L),
      // negative ids: bucket math is (id - lo) with lo = per-source min
      (-50L, "d", 300L), (-2L, "d", 300L), (7L, "d", 900L))
    for (ranges <- Seq(1, 3, 16))
      assertPathsAgree(synth(rows), budget = 1024, ranges = ranges)
  }

  test("null ids agree across paths: nulls-first, bucket -1 on the scale path") {
    // one null id per source keeps the outcome deterministic (multiple
    // nulls share the duplicate-id nondeterminism caveat on BOTH paths)
    val rows = Seq[(java.lang.Long, String, java.lang.Long)](
      (null, "a", 700L), (1L, "a", 400L), (2L, "a", 400L),
      (10L, "b", 100L), (null, "b", 950L), (11L, "b", 100L))
    val df = rows.toDF("doc_id", "source", "n_tokens")
    for (ranges <- Seq(1, 2, 8)) {
      val w = Pack.packWindowed(df, "doc_id", "source", "n_tokens", 1000)
      val d = Pack.packSequences(df, "doc_id", "source", "n_tokens", 1000,
        ranges)
      def m(x: DataFrame) = x.select("doc_id", "source", "pack_id")
        .collect().map(r => (Option(r.get(0)), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(m(d) === m(w), s"ranges=$ranges")
      // the null row's 700 tokens occupy pack 0 of source a: doc 1 stays in
      // pack 0 (cum_before 700), doc 2 spills to pack 1 (cum_before 1100)
      assert(m(w)((None, "a")) === 0L && m(w)((Some(1L), "a")) === 0L &&
        m(w)((Some(2L), "a")) === 1L)
    }
  }

  test("empty input produces an empty result on both paths") {
    val empty = synth(Seq.empty)
    assert(Pack.packWindowed(empty, "doc_id", "source", "n_tokens", 100)
      .count() === 0)
    assert(Pack.packSequences(empty, "doc_id", "source", "n_tokens", 100, 4)
      .count() === 0)
  }

  test("pack boundaries are correct first-fit: cum-before drives the id") {
    // budget 100; tokens 60,60,60 -> cum_before 0,60,120 -> packs 0,0,1
    val rows = Seq((1L, "s", 60L), (2L, "s", 60L), (3L, "s", 60L))
    val out = asMap(
      Pack.packSequences(synth(rows), "doc_id", "source", "n_tokens", 100, 2))
    assert(out === Map((1L, "s") -> 0L, (2L, "s") -> 0L, (3L, "s") -> 1L))
  }
}
