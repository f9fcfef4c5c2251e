package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom prefilter: no false negatives, high selectivity, exact result") {
    val keep = spark.range(0, 1000, 7).select(col("id").as("k")) // 143 keys
    val bf = keep.agg(call_function("bloom_agg", col("k"),
      lit(200L), lit(4000L)).as("bf")).head().getAs[Array[Byte]]("bf")
    val big = spark.range(100000).select((col("id") % 1000).as("k"))
    val pre = big.filter(call_function("bloom_might_contain", lit(bf),
      col("k")))
    // every true member passes (no false negatives) — exactness-neutral
    val exact = big.join(keep, Seq("k"), "left_semi")
    assert(pre.join(keep, Seq("k"), "left_semi").count() === exact.count())
    // the prefilter must actually prune: pass rate near 143/1000 + FP
    val passRate = pre.count().toDouble / 100000
    assert(passRate < 0.25, s"bloom barely filters: pass rate $passRate")
    assert(passRate >= 0.143, "bloom dropped true members")
  }

  test("bloom handles empty build side and null probe keys") {
    val empty = spark.range(0).select(col("id").as("k"))
    val bf = empty.agg(call_function("bloom_agg", col("k"),
      lit(10L), lit(100L)).as("bf")).head().getAs[Array[Byte]]("bf")
    // an empty build side yields a null/empty sketch; the probe must not
    // throw and must pass nothing when the blob is null
    val probe = Seq(Some(1L), None).toDF("k")
    if (bf == null) {
      val out = probe.filter(call_function("bloom_might_contain",
        lit(null).cast("binary"), col("k")))
      assert(out.count() === 0L)
    } else {
      val out = probe.filter(call_function("bloom_might_contain", lit(bf),
        col("k")))
      assert(out.count() === 0L)
    }
  }
}
