package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TTL / strictness / tie-break semantics of the as-of join (the Feast
  * get_historical_features surface, SURVEY.md §7.4 risk 3). */
class PointInTimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def feats = Seq(
    // (f_id, key, f_ts, payload)
    (1L, "u1", 100L, "a"), (2L, "u1", 200L, "b"), (3L, "u1", 200L, "c"),
    (4L, "u1", 300L, "d"), (5L, "u2", 50L, "e"))
    .toDF("f_id", "k", "f_ts", "payload")

  test("latestPerKey keeps max (ts, tieBreak) row per key") {
    val out = PointInTime.latestPerKey(feats, Seq("k"), "f_ts", "f_id")
      .select("k", "f_id", "payload").as[(String, Long, String)]
      .collect().toSet
    assert(out === Set(("u1", 4L, "d"), ("u2", 5L, "e")))
  }

  test("asof strict: right rows at exactly leftTs are excluded") {
    val left = Seq((10L, "u1", 200L)).toDF("p_id", "k", "p_ts")
    val strict = PointInTime.asofJoin(left, feats, Seq("k"), "p_ts", "f_ts",
      ttlUs = 1000L, strict = true, rightTieBreak = "f_id")
    assert(strict.select("f_id").as[Long].head() === 1L) // only ts=100 < 200
    val lax = PointInTime.asofJoin(left, feats, Seq("k"), "p_ts", "f_ts",
      ttlUs = 1000L, strict = false, rightTieBreak = "f_id")
    // ts=200 now eligible; tie between f_id 2 and 3 -> max f_id wins
    assert(lax.select("f_id").as[Long].head() === 3L)
  }

  test("TTL lower bound is inclusive; older rows excluded") {
    val left = Seq((10L, "u1", 400L)).toDF("p_id", "k", "p_ts")
    val out = PointInTime.asofJoin(left, feats, Seq("k"), "p_ts", "f_ts",
      ttlUs = 100L, strict = true, rightTieBreak = "f_id")
    // window [300, 400): only f_ts=300 qualifies
    assert(out.select("f_id").as[Long].head() === 4L)
    val none = PointInTime.asofJoin(left, feats, Seq("k"), "p_ts", "f_ts",
      ttlUs = 50L, strict = true, rightTieBreak = "f_id")
    // window [350, 400): no features -> left row kept with nulls
    assert(none.count() === 1L && none.select("f_id").head().isNullAt(0))
  }

  test("unmatched keys keep left row with null feature columns") {
    val left = Seq((11L, "nope", 500L)).toDF("p_id", "k", "p_ts")
    val out = PointInTime.asofJoin(left, feats, Seq("k"), "p_ts", "f_ts",
      ttlUs = 1000L)
    assert(out.count() === 1L && out.select("payload").head().isNullAt(0))
  }
}
