package graft.ops

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed running total must equal the single-window formulation
  * exactly, for ANY bucket count, and its executed plan must carry no
  * unpartitioned WindowExec (the single-task shape it exists to remove). */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed values (heavy ties at 7), negatives, unique tie keys
  private def fixture = (1 to 500).map { i =>
    val v = if (i % 3 == 0) 7L else (i * 37 % 211).toLong - 20
    (i.toLong, v)
  }.toDF("k", "v")

  private def oracle = {
    val w = Window.orderBy(col("v").desc, col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fixture.withColumn("cum", sum(col("v")).over(w))
      .withColumn("tot", sum(col("v")).over(Window.partitionBy()))
      .select("k", "cum", "tot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
  }

  test("matches the single-window cumsum for several bucket counts") {
    val expected = oracle
    for (b <- Seq(1, 3, 8, 64)) {
      val got = PrefixSum
        .runningTotalDesc(fixture, "v", "k", "cum", "tot", buckets = b)
        .select("k", "cum", "tot").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(got.toSeq == expected.toSeq, s"buckets=$b diverged")
    }
  }

  // a Window with no partition spec plans a SinglePartition exchange —
  // that is the single-task shape PrefixSum exists to remove
  private def singlePartitionNodes(plan: String): Seq[String] =
    plan.linesIterator.filter(_.contains("SinglePartition")).toSeq

  test("detector trips on the single-window formulation (not vacuous)") {
    val w = Window.orderBy(col("v").desc, col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = fixture.withColumn("cum", sum(col("v")).over(w))
    out.collect()
    assert(singlePartitionNodes(
      out.queryExecution.executedPlan.toString).nonEmpty)
  }

  test("executed plan has no single-partition exchange") {
    val out = PrefixSum
      .runningTotalDesc(fixture, "v", "k", "cum", "tot", buckets = 8)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(singlePartitionNodes(plan).isEmpty,
      s"single-partition exchange in plan:\n$plan")
  }

  test("rankDesc matches the single-window row_number for any buckets") {
    val w = Window.orderBy(col("v").desc, col("k"))
    val expected = fixture.withColumn("r", row_number().over(w))
      .select("k", "r").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).sortBy(_._1)
    for (b <- Seq(1, 5, 32)) {
      val got = PrefixSum.rankDesc(fixture, "v", "k", "r", "n", buckets = b)
        .select("k", "r", "n").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.forall(_._3 == 500L))
      assert(got.map(t => (t._1, t._2)).sortBy(_._1).toSeq ==
        expected.toSeq, s"buckets=$b diverged")
    }
  }

  test("ntileDesc matches the single-window NTILE, remainder semantics included") {
    // 500 rows: k=7 leaves remainder 3, k=500 exact, k=617 > n (every
    // tile size 0/1 — the lazy-branch div-by-zero hazard), k=1 trivial
    for (k <- Seq(1, 7, 10, 500, 617)) {
      val w = Window.orderBy(col("v").desc, col("k"))
      val expected = fixture.withColumn("t", ntile(k).over(w))
        .select("k", "t").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      val got = PrefixSum.ntileDesc(fixture, "v", "k", "t", k, buckets = 8)
        .select("k", "t").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      assert(got.toSeq == expected.toSeq, s"k=$k diverged")
    }
  }

  test("rank/ntile plans carry no single-partition exchange") {
    val out = PrefixSum.ntileDesc(fixture, "v", "k", "t", 10, buckets = 8)
    out.collect()
    assert(singlePartitionNodes(
      out.queryExecution.executedPlan.toString).isEmpty)
  }

  test("empty input yields empty output") {
    val empty = fixture.filter(col("k") < 0)
    assert(PrefixSum
      .runningTotalDesc(empty, "v", "k", "cum", "tot", buckets = 4)
      .count() == 0L)
  }

  // ---- running max (the q193 skyline sweep monoid) ---------------------

  // x with heavy ties, y uncorrelated; nullable expected via java Long
  private def maxFixture = (1 to 400).map { i =>
    val x = (i * 13 % 97).toLong        // ~4 ties per x value
    val y = (i * 29 % 211).toLong - 50
    (i.toLong, x, y)
  }.toDF("k", "x", "y")

  private def maxOracle: Seq[(Long, Option[Long])] = {
    val w = Window.orderBy(col("x"))
      .rangeBetween(Window.unboundedPreceding, -1L)
    maxFixture.withColumn("m", max(col("y")).over(w))
      .select("k", "m").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq.sortBy(_._1)
  }

  test("runningMaxStrictAsc matches the single-window strict-range max") {
    val expected = maxOracle
    for (b <- Seq(1, 3, 8, 64)) {
      val got = PrefixSum
        .runningMaxStrictAsc(maxFixture, "x", "y", "m", buckets = b)
        .select("k", "m").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq.sortBy(_._1)
      assert(got == expected, s"buckets=$b diverged")
    }
  }

  test("runningMaxStrictAsc plan has no single-partition exchange — " +
      "including on a NARROW value domain") {
    // the r13 skyline finding: a fixed-width band prune collapses to one
    // task when the whole value range fits one band. Quantile boundaries
    // cannot: this fixture's x spans only [0, 3] (one 2^30 band with
    // room to spare) and the plan must still fan out.
    val narrow = (1 to 300).map(i =>
      (i.toLong, (i % 4).toLong, (i * 7 % 100).toLong)).toDF("k", "x", "y")
    for (df <- Seq(maxFixture, narrow)) {
      val out = PrefixSum.runningMaxStrictAsc(df, "x", "y", "m", buckets = 8)
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
      assert(singlePartitionNodes(plan).isEmpty,
        s"single-partition exchange in plan:\n$plan")
    }
  }

  test("runningMaxStrictAsc narrow-domain output still matches the oracle") {
    val narrow = (1 to 300).map(i =>
      (i.toLong, (i % 4).toLong, (i * 7 % 100).toLong)).toDF("k", "x", "y")
    val w = Window.orderBy(col("x"))
      .rangeBetween(Window.unboundedPreceding, -1L)
    val expected = narrow.withColumn("m", max(col("y")).over(w))
      .select("k", "m").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq.sortBy(_._1)
    for (b <- Seq(2, 8)) {
      val got = PrefixSum
        .runningMaxStrictAsc(narrow, "x", "y", "m", buckets = b)
        .select("k", "m").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq.sortBy(_._1)
      assert(got == expected, s"buckets=$b diverged")
    }
  }

  // ---- fused multi-column NTILE (the q231 RFM shape) --------------------

  test("ntileDescMany is bit-for-bit ntileDesc per column") {
    val df = (1 to 500).map { i =>
      (i.toLong, (i * 37 % 211).toLong, (i * 13 % 91).toLong,
        (i * 101 % 401).toLong)
    }.toDF("k", "a", "b", "c")
    val fused = PrefixSum.ntileDescMany(df, Seq(
        ("a", "k", "ta", 5), ("b", "k", "tb", 7), ("c", "k", "tc", 617)),
        buckets = 8)
      .select("k", "ta", "tb", "tc").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1)
    val chained = PrefixSum.ntileDesc(
        PrefixSum.ntileDesc(
          PrefixSum.ntileDesc(df, "a", "k", "ta", 5, buckets = 8),
          "b", "k", "tb", 7, buckets = 8),
        "c", "k", "tc", 617, buckets = 8)
      .select("k", "ta", "tb", "tc").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1)
    assert(fused.toSeq == chained.toSeq)
  }

  test("ntileDescMany plan has no single-partition exchange") {
    val df = (1 to 500).map { i =>
      (i.toLong, (i * 37 % 211).toLong, (i * 13 % 91).toLong)
    }.toDF("k", "a", "b")
    val out = PrefixSum.ntileDescMany(df,
      Seq(("a", "k", "ta", 5), ("b", "k", "tb", 5)), buckets = 8)
    out.collect()
    assert(singlePartitionNodes(
      out.queryExecution.executedPlan.toString).isEmpty)
  }

  test("ntileDescMany on empty input yields empty output") {
    val empty = (1 to 10).map(i => (i.toLong, i.toLong, i.toLong))
      .toDF("k", "a", "b").filter(col("k") < 0)
    assert(PrefixSum.ntileDescMany(empty,
      Seq(("a", "k", "ta", 5), ("b", "k", "tb", 3)), buckets = 4)
      .count() == 0L)
  }
}
