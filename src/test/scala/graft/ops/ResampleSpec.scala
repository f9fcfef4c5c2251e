package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Gap fill: grid shape, cell means, interpolation arithmetic, NULL
  * posture, span fail-fast, partitioning invariance. */
class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hour: Int, min: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $hour%02d:$min%02d:00")

  test("holes are linearly interpolated between bracketing observations") {
    // key 1 observed at hour-buckets 0, 3 (values 10, 40): holes at 1, 2
    // must land on the line: 20, 30
    val df = Seq((1L, ts(0), 10.0), (1L, ts(3), 40.0)).toDF("k", "ts", "v")
    val out = Resample.gapFill(df, "k", "ts", "v", bucketSec = 3600)
      .orderBy("bucket").collect()
    assert(out.length === 4)
    assert(out.map(_.getDouble(2)).toSeq === Seq(10.0, 20.0, 30.0, 40.0))
    assert(out.map(_.getBoolean(3)).toSeq ===
      Seq(true, false, false, true))
  }

  test("cell mean is the micro-unit integer mean; grid edges observed") {
    // two observations in one bucket: mean((1.25, 1.75)) = 1.5 exactly
    val df = Seq((7L, ts(5, 10), 1.25), (7L, ts(5, 40), 1.75),
      (7L, ts(7), 9.0)).toDF("k", "ts", "v")
    val out = Resample.gapFill(df, "k", "ts", "v", bucketSec = 3600)
      .orderBy("bucket").collect()
    assert(out.length === 3) // buckets 5, 6, 7
    assert(out(0).getDouble(2) === 1.5)
    assert(out(1).getDouble(2) === (1.5 + 9.0) / 2) // midpoint hole
    assert(out(2).getDouble(2) === 9.0)
  }

  test("null keys, timestamps and values are dropped before bucketing") {
    val df = Seq(
      (Some(1L), Option(ts(0)), Some(2.0)),
      (None, Option(ts(1)), Some(3.0)),
      (Some(1L), None, Some(4.0)),
      (Some(1L), Option(ts(1)), None),
      (Some(1L), Option(ts(2)), Some(6.0))).toDF("k", "ts", "v")
    val out = Resample.gapFill(df, "k", "ts", "v", bucketSec = 3600)
      .orderBy("bucket").collect()
    // only the two clean rows observed: buckets 0 and 2, hole at 1
    assert(out.length === 3)
    assert(out.map(_.getDouble(2)).toSeq === Seq(2.0, 4.0, 6.0))
  }

  test("a key span wider than maxBuckets fails fast, not explodes") {
    val df = Seq((1L, ts(0), 1.0),
      (1L, Timestamp.valueOf("2031-01-01 00:00:00"), 2.0)).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      Resample.gapFill(df, "k", "ts", "v", bucketSec = 3600,
        maxBuckets = 1000).collect()
    }
    assert(e.getMessage != null)
  }

  test("result is invariant to input partitioning") {
    val rows = (0 until 500).map { i =>
      (i % 7L, ts(i % 24, i % 60), (i % 13).toDouble)
    }
    val a = Resample.gapFill(rows.toDF("k", "ts", "v"), "k", "ts", "v", 3600)
      .orderBy("k", "bucket").collect().toSeq
    val b = Resample.gapFill(rows.toDF("k", "ts", "v").repartition(17),
        "k", "ts", "v", 3600)
      .orderBy("k", "bucket").collect().toSeq
    assert(a === b)
  }
}
