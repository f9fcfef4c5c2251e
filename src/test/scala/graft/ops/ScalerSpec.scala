package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScalerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fit computes min/max/mean/std; transform matches hand math") {
    val df = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("x")
    val m = Scaler.fit(df, Seq("x"))
    val s = m.stats("x")
    assert(s.min === 2.0 && s.max === 9.0 && s.n === 8L)
    assert(s.mean === 5.0)
    assert(s.std === 2.0) // textbook example: population std exactly 2
    val out = df.select(m.zscore("x").as("z"), m.minmax("x").as("mm"))
      .collect().toSeq.map(r => (r.getDouble(0), r.getDouble(1)))
    assert(out.head === ((-1.5, 0.0)))       // (2-5)/2, (2-2)/(9-2)
    assert(out.last === ((2.0, 1.0)))        // (9-5)/2, (9-2)/(9-2)
  }

  test("nulls excluded from stats and transform to null") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    val m = Scaler.fit(df, Seq("x"))
    assert(m.stats("x").n === 2L && m.stats("x").mean === 2.0)
    val z = df.select(m.zscore("x")).collect()
    assert(!z(0).isNullAt(0) && z(1).isNullAt(0) && !z(2).isNullAt(0))
  }

  test("degenerate columns: constant -> 0, empty -> all-null safe") {
    val const = Seq(7.0, 7.0, 7.0).toDF("x")
    val m = Scaler.fit(const, Seq("x"))
    assert(m.stats("x").std === 0.0)
    val out = const.select(m.zscore("x").as("z"), m.minmax("x").as("mm"))
      .collect().toSeq.map(r => (r.getDouble(0), r.getDouble(1)))
    assert(out.forall(_ == ((0.0, 0.0))))
    val empty = Seq.empty[Double].toDF("x")
    assert(Scaler.fit(empty, Seq("x")).stats("x").n === 0L)
  }

  test("save/load round-trips the model bit-for-bit") {
    val df = Seq(1.5, 2.5, 10.25, -3.0).toDF("x")
    val m = Scaler.fit(df, Seq("x"))
    val path = java.nio.file.Files
      .createTempDirectory("scaler").toString + "/m"
    m.save(spark, path)
    val m2 = Scaler.load(spark, path)
    assert(m2.stats === m.stats)
    assert(df.select(m2.zscore("x")).collect().toSeq ===
      df.select(m.zscore("x")).collect().toSeq)
  }

  test("transform plan is join-free (stats are literals)") {
    val df = Seq(1.0, 2.0, 3.0).toDF("x")
    val m = Scaler.fit(df, Seq("x"))
    val plan = df.select(m.zscore("x"))
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("join"), plan)
  }
}
