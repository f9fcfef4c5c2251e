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
}
