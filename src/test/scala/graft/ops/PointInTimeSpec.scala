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

  test("differential: asofJoin equals an independent window-based implementation on random data") {
    val rnd = new scala.util.Random(99)
    val keys = Seq("a", "b", "c", "d")
    val feats = (1 to 300).map(i =>
      (i.toLong, keys(rnd.nextInt(keys.size)), rnd.nextInt(1000).toLong,
        s"p$i")).toDF("f_id", "k", "f_ts", "payload")
    val lefts = (1 to 80).map(i =>
      (1000L + i, keys(rnd.nextInt(keys.size)), rnd.nextInt(1100).toLong))
      .toDF("p_id", "k", "p_ts")
    val ttl = 200L

    val viaOp = PointInTime.asofJoin(lefts, feats, Seq("k"), "p_ts", "f_ts",
      ttlUs = ttl, strict = true, rightTieBreak = "f_id")
      .select("p_id", "f_id").as[(Long, Option[Long])].collect().toMap

    // independent formulation: join-all + row_number window, rank 1
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val j = lefts.join(feats, Seq("k"))
      .filter(col("f_ts") < col("p_ts") && col("f_ts") >= col("p_ts") - ttl)
      .withColumn("rn", row_number().over(Window.partitionBy("p_id")
        .orderBy(desc("f_ts"), desc("f_id"))))
      .filter(col("rn") === 1)
    val viaWindow = lefts.join(j.select("p_id", "f_id"), Seq("p_id"), "left")
      .select("p_id", "f_id").as[(Long, Option[Long])].collect().toMap

    assert(viaOp === viaWindow)
    assert(viaOp.size === 80)
    assert(viaOp.values.exists(_.isDefined) && viaOp.values.exists(_.isEmpty))
  }

  test("asofJoin is correct on a SHUFFLED left input (the rowid double-" +
      "execution class) and chains across views") {
    // The round-15 bug: a left input whose row order is not
    // execution-stable (any shuffled/aggregated frame — here an
    // aggregate output, exactly the multi-view chaining shape) made the
    // old two-reference rowid plan attach features to the WRONG rows.
    // Ground truth is computed on the driver from the same data.
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val keys = (1 to 16).map(i => s"k$i")
    val featRows = (1 to 500).map(i =>
      (i.toLong, keys(rnd.nextInt(keys.size)), rnd.nextInt(2000).toLong))
    val feats = featRows.toDF("f_id", "k", "f_ts")
    val entityRows = (1 to 200).map(i =>
      (keys(rnd.nextInt(keys.size)), rnd.nextInt(2200).toLong))
    // SHUFFLED left: per-key aggregate (one row per (k, bucket)) whose
    // partition-internal order is whatever the exchange produced
    val lefts = entityRows.toDF("k", "ts0")
      .groupBy(col("k"), (col("ts0") % 7).as("bucket"))
      .agg(max(col("ts0")).as("p_ts"))
      .repartition(13)
    val ttl = 400L
    val got = PointInTime.asofJoin(lefts, feats, Seq("k"), "p_ts", "f_ts",
        ttlUs = ttl, strict = true, rightTieBreak = "f_id")
      .select("k", "bucket", "p_ts", "f_id")
      .as[(String, Long, Long, Option[Long])].collect()
    // driver-side ground truth per (k, p_ts)
    val byKey = featRows.groupBy(_._2)
    def truth(k: String, pTs: Long): Option[Long] =
      byKey.getOrElse(k, Seq.empty)
        .filter(f => f._3 < pTs && f._3 >= pTs - ttl)
        .sortBy(f => (-f._3, -f._1)).headOption.map(_._1)
    assert(got.nonEmpty)
    got.foreach { case (k, b, pTs, fId) =>
      assert(fId === truth(k, pTs),
        s"wrong feature attached at ($k, bucket $b, p_ts $pTs)") }
    // and the chain: a second asofJoin OVER the first one's output
    // (the q291 multi-view shape) still attaches per-row-correctly
    val feats2 = (1 to 300).map(i =>
      (10000L + i, keys(rnd.nextInt(keys.size)), rnd.nextInt(2200).toLong))
    val f2 = feats2.toDF("g_id", "k", "g_ts")
    val step1 = PointInTime.asofJoin(lefts, feats, Seq("k"), "p_ts", "f_ts",
      ttlUs = ttl, strict = true, rightTieBreak = "f_id")
    val step2 = PointInTime.asofJoin(step1, f2, Seq("k"), "p_ts", "g_ts",
        ttlUs = 2 * ttl, strict = true, rightTieBreak = "g_id")
      .select("k", "p_ts", "f_id", "g_id")
      .as[(String, Long, Option[Long], Option[Long])].collect()
    val byKey2 = feats2.groupBy(_._2)
    def truth2(k: String, pTs: Long): Option[Long] =
      byKey2.getOrElse(k, Seq.empty)
        .filter(f => f._3 < pTs && f._3 >= pTs - 2 * ttl)
        .sortBy(f => (-f._3, -f._1)).headOption.map(_._1)
    step2.foreach { case (k, pTs, fId, gId) =>
      assert(fId === truth(k, pTs), s"view-1 feature wrong after chain at ($k, $pTs)")
      assert(gId === truth2(k, pTs), s"view-2 feature wrong at ($k, $pTs)")
    }
  }

  test("unmatched keys keep left row with null feature columns") {
    val left = Seq((11L, "nope", 500L)).toDF("p_id", "k", "p_ts")
    val out = PointInTime.asofJoin(left, feats, Seq("k"), "p_ts", "f_ts",
      ttlUs = 1000L)
    assert(out.count() === 1L && out.select("payload").head().isNullAt(0))
  }
}
