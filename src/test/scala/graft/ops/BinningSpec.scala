package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Quantile binning: equal-population buckets, literal-only transform,
  * NULL and degenerate-mass postures. */
class BinningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("uniform data lands in near-equal buckets; cuts are monotone") {
    val df = spark.range(10000).select((col("id") % 1000).cast("double").as("x"))
    val cuts = Binning.fitCuts(df, "x", 0.0, 1000.0, 500, nBuckets = 10)
    assert(cuts.length === 9)
    assert(cuts.toSeq === cuts.sorted.toSeq)
    val counts = df.select(Binning.bucketize(col("x"), cuts).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(counts.keySet === (0L to 9L).toSet)
    counts.values.foreach(c => assert(math.abs(c - 1000L) <= 200, counts))
  }

  test("point-mass data collapses cuts; affected buckets are empty") {
    val df = spark.range(1000).select(lit(42.0).as("x"))
    val cuts = Binning.fitCuts(df, "x", 0.0, 100.0, 100, nBuckets = 4)
    // every quantile is the same bin midpoint
    assert(cuts.distinct.length === 1)
    val b = df.select(Binning.bucketize(col("x"), cuts).as("b"))
      .distinct().as[Long].collect().toSeq
    assert(b === Seq(0L)) // 42.0 < midpoint-of-bin-42 (42.5): all cuts above
  }

  test("NULL in, NULL out; transform is join-free codegen") {
    val df = Seq(Some(5.0), None, Some(95.0)).toDF("x")
    val cuts = Array(10.0, 50.0, 90.0)
    val out = df.select(Binning.bucketize(col("x"), cuts).as("b")).collect()
    assert(out(0).getLong(0) === 0L)
    assert(out(1).isNullAt(0))
    assert(out(2).getLong(0) === 3L)
    val plan = df.select(Binning.bucketize(col("x"), cuts))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }
}
