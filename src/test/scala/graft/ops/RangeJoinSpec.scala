package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bucketized range joins must be EXACTLY the nested-loop semantics
  * (bucketing generates candidates only), surface each qualifying pair
  * once, and never plan a BroadcastNestedLoopJoin/CartesianProduct —
  * the plan shape they exist to replace. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(31)

  test("pointInInterval == naive filter, boundaries inclusive, exactly once") {
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextInt(2000) - 500))
      .toDF("pid", "x")
    val ivs = (1 to 80).map { i =>
      val lo = rnd.nextInt(2000) - 600
      (i.toLong, lo, lo + rnd.nextInt(300)) // widths 0..299 across buckets
    }.toDF("iid", "lo", "hi")
    for (w <- Seq(16.0, 100.0, 1000.0)) {
      val got = RangeJoin.pointInInterval(pts, "x", ivs, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq
      val want = pts.crossJoin(ivs)
        .filter(col("x") >= col("lo") && col("x") <= col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSeq
      assert(got.sorted === want.sorted, s"width $w")
      assert(got.size === got.distinct.size, s"duplicates at width $w")
    }
    // boundary containment: pt == lo and pt == hi both match
    val b = RangeJoin.pointInInterval(
      Seq((1L, 10), (2L, 20), (3L, 9), (4L, 21)).toDF("pid", "x"),
      "x", Seq((9L, 10, 20)).toDF("iid", "lo", "hi"), "lo", "hi", 7.0)
      .select("pid").as[Long].collect().toSorted
    assert(b === Seq(1L, 2L))
  }

  test("pointInInterval: NULLs and inverted intervals drop; plan is equi-join") {
    val pts = Seq((1L, Some(5)), (2L, None)).toDF("pid", "x")
    val ivs = Seq((1L, Some(0), Some(10)), (2L, None, Some(10)),
      (3L, Some(10), Some(0))).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, "x", ivs, "lo", "hi", 4.0)
    assert(out.select("pid", "iid").as[(Long, Long)].collect().toSeq
      === Seq((1L, 1L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("intervalOverlap == naive filter, exactly once, touch counts") {
    val as = (1 to 120).map { i =>
      val lo = rnd.nextInt(1500) - 300
      (i.toLong, lo, lo + rnd.nextInt(200))
    }.toDF("aid", "alo", "ahi")
    val bs = (1 to 90).map { i =>
      val lo = rnd.nextInt(1500) - 300
      (i.toLong, lo, lo + rnd.nextInt(400))
    }.toDF("bid", "blo", "bhi")
    for (w <- Seq(32.0, 250.0)) {
      val got = RangeJoin.intervalOverlap(as, "alo", "ahi", bs, "blo", "bhi", w)
        .select("aid", "bid").as[(Long, Long)].collect().toSeq
      val want = as.crossJoin(bs)
        .filter(col("alo") <= col("bhi") && col("blo") <= col("ahi"))
        .select("aid", "bid").as[(Long, Long)].collect().toSeq
      assert(got.sorted === want.sorted, s"width $w")
      assert(got.size === got.distinct.size, s"duplicates at width $w")
    }
    // touching endpoints overlap (closed intervals)
    val t = RangeJoin.intervalOverlap(
      Seq((1L, 0, 10)).toDF("aid", "alo", "ahi"), "alo", "ahi",
      Seq((2L, 10, 20), (3L, 11, 20)).toDF("bid", "blo", "bhi"),
      "blo", "bhi", 6.0)
      .select("bid").as[Long].collect().toSeq
    assert(t === Seq(2L))
  }

  test("salted join == unsalted under a planted hot bucket") {
    // 2000 points piled into ONE bucket (width 100, values 0..99) plus a
    // scattered tail; salting must spread the hot bucket's candidates
    // without changing the result set or duplicating pairs.
    val pts = ((1 to 2000).map(i => (i.toLong, rnd.nextInt(100))) ++
      (2001 to 2200).map(i => (i.toLong, rnd.nextInt(5000))))
      .toDF("pid", "x")
    val ivs = (1 to 60).map { i =>
      val lo = rnd.nextInt(5000) - 100
      (i.toLong, lo, lo + rnd.nextInt(250))
    }.toDF("iid", "lo", "hi")
    val plain = RangeJoin.pointInInterval(pts, "x", ivs, "lo", "hi", 100.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    for (s <- Seq(4, 7)) {
      val salted = RangeJoin
        .pointInInterval(pts, "x", ivs, "lo", "hi", 100.0, saltBuckets = s)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq
      assert(salted.sorted === plain, s"saltBuckets=$s")
      assert(salted.size === salted.distinct.size, s"dups at saltBuckets=$s")
    }
    // overlap flavor: salted == unsalted, exactly once
    val as = (1 to 150).map { i =>
      val lo = rnd.nextInt(300) // all of side a crowds a few buckets
      (i.toLong, lo, lo + rnd.nextInt(80))
    }.toDF("aid", "alo", "ahi")
    val bs = (1 to 70).map { i =>
      val lo = rnd.nextInt(2000) - 200
      (i.toLong, lo, lo + rnd.nextInt(300))
    }.toDF("bid", "blo", "bhi")
    val oPlain = RangeJoin.intervalOverlap(as, "alo", "ahi", bs, "blo", "bhi",
      128.0).select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
    val oSalted = RangeJoin.intervalOverlap(as, "alo", "ahi", bs, "blo", "bhi",
      128.0, saltBuckets = 5)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    assert(oSalted.sorted === oPlain)
    assert(oSalted.size === oSalted.distinct.size)
  }

  test("reserved internal column names in inputs are rejected loudly") {
    val pts = Seq((1L, 5)).toDF("pid", "x")
    val ivs = Seq((1L, 0, 10)).toDF("iid", "lo", "hi")
    val clash = pts.withColumn("__rj_b", lit(1))
    val e1 = intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(clash, "x", ivs, "lo", "hi", 4.0))
    assert(e1.getMessage.contains("__rj_b"))
    val e2 = intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(pts, "x",
        ivs.withColumn("__rj_s", lit(1)), "lo", "hi", 4.0))
    assert(e2.getMessage.contains("__rj_s"))
    val e3 = intercept[IllegalArgumentException](
      RangeJoin.intervalOverlap(
        Seq((1L, 0, 10)).toDF("aid", "alo", "ahi").withColumn("__rj_b", lit(2)),
        "alo", "ahi", Seq((2L, 5, 15)).toDF("bid", "blo", "bhi"),
        "blo", "bhi", 4.0))
    assert(e3.getMessage.contains("__rj_b"))
  }

  test("pathologically wide interval fails fast instead of exploding") {
    val pts = Seq((1L, 5)).toDF("pid", "x")
    val ivs = Seq((1L, 0, 2000000000)).toDF("iid", "lo", "hi")
    val e = intercept[Exception](
      RangeJoin.pointInInterval(pts, "x", ivs, "lo", "hi", 0.001).collect())
    assert(e.getMessage.contains("buckets") ||
      e.getCause != null && e.getCause.getMessage.contains("buckets"))
  }

  private implicit class Sorted(s: Array[Long]) {
    def toSorted: Seq[Long] = s.toSeq.sorted
  }
}
