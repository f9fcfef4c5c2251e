package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact below k; within 15% above k; merge across partitions") {
    // fewer distincts than k -> exact
    val small = spark.range(100).select((col("id") % 37).as("v"))
      .repartition(8)
    val exactSmall = small.agg(Sketches.kmvDistinct(col("v"), k = 256))
      .as[Long].head()
    assert(exactSmall === 37L)

    // 10k distincts, k=256 -> estimate within 15%
    val big = spark.range(50000).select((col("id") % 10000).as("v"))
      .repartition(16)
    val est = big.agg(Sketches.kmvDistinct(col("v"), k = 256)).as[Long].head()
    assert(math.abs(est - 10000.0) / 10000.0 < 0.15, s"estimate $est off >15%")
  }

  test("md5 hash mode: exact below k, sane estimate above k (oracle mode)") {
    val small = spark.range(100).select((col("id") % 37).as("v"))
      .repartition(8)
    assert(small.agg(Sketches.kmvDistinct(col("v"), 256, "md5"))
      .as[Long].head() === 37L)
    val big = spark.range(50000).select((col("id") % 10000).as("v"))
      .repartition(16)
    val est = big.agg(Sketches.kmvDistinct(col("v"), 256, "md5")).as[Long].head()
    assert(math.abs(est - 10000.0) / 10000.0 < 0.15, s"estimate $est off >15%")
  }

  test("deterministic across runs") {
    val df = spark.range(5000).select((col("id") % 999).as("v")).repartition(8)
    val a = df.agg(Sketches.kmvDistinct(col("v"))).as[Long].head()
    val b = df.agg(Sketches.kmvDistinct(col("v"))).as[Long].head()
    assert(a === b)
  }
}
