package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-store temporal operators: latest-per-key and point-in-time
  * ("as-of") join — the reference's online-store materialization and
  * `get_historical_features` surface (/root/reference/feast-feature-store/
  * feature_retrieval/get_fv.py:32-47, ingest_stream_to_online_store.py:48-82).
  *
  * Event times are BIGINT epoch-micros throughout (exact integer compare,
  * no timestamp-precision ambiguity across engines).
  */
object PointInTime {

  /** Latest feature row per entity key: `max_by(struct(ts, tieBreak, *)),`
    * one shuffle, map-side partial aggregation. This is the batch analogue of
    * the Redis online store's newest-value-per-key semantics — but ordered by
    * *event time* (ts, then tieBreak), not arrival order, which fixes the
    * reference's out-of-order upsert weakness (SURVEY.md §7.4 risk 4).
    */
  def latestPerKey(df: DataFrame, key: Seq[String], ts: String,
                   tieBreak: String): DataFrame = {
    val payloadCols = df.columns.filterNot(key.contains)
    val payload = struct(payloadCols.toSeq.map(col): _*)
    df.groupBy(key.map(col): _*)
      .agg(max_by(payload, struct(col(ts), col(tieBreak))).as("__latest"))
      .select(key.map(col) :+ col("__latest.*"): _*)
  }

  /** Point-in-time join: for each left row, attach the single newest right
    * row with the same key and `rightTs <= leftTs` (strict `<` if
    * `strict`), no older than `ttlUs`. Left rows with no match keep nulls
    * (left-outer semantics), mirroring Feast TTL semantics
    * (user_features.py:11).
    *
    * Implementation: range-condition join + `max_by` re-aggregation keyed by
    * a unique left row id. One shuffle for the join, one for the re-agg; the
    * TTL bound keeps the range-join fan-out proportional to the per-key event
    * density inside the TTL window rather than all history. For very hot keys
    * AQE skew-join splits the partitions.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTs: String, rightTs: String, ttlUs: Long,
               strict: Boolean = true,
               rightTieBreak: String = null): DataFrame = {
    val l = left.withColumn("__rowid", monotonically_increasing_id())
    // Re-alias every right column to fresh attributes so left/right may share
    // a source (self-join) without ambiguous-reference analysis errors.
    val r = right.select(right.columns.toSeq.map(c => col(c).as(s"__r_$c")): _*)
    def rc(c: String) = col(s"__r_$c")
    val tsCond =
      if (strict) rc(rightTs) < col(leftTs) else rc(rightTs) <= col(leftTs)
    val cond = key.map(k => col(k) === rc(k)).reduce(_ && _) &&
      tsCond && rc(rightTs) >= col(leftTs) - lit(ttlUs)
    val rightCols = right.columns.filterNot(key.contains)
    val ord = if (rightTieBreak == null) Seq(rc(rightTs))
              else Seq(rc(rightTs), rc(rightTieBreak))
    val payload = struct(rightCols.toSeq.map(c => rc(c).as(c)): _*)
    val matched = l.join(r, cond, "inner")
      .groupBy(col("__rowid"))
      .agg(max_by(payload, struct(ord: _*)).as("__m"))
    l.join(matched, Seq("__rowid"), "left")
      .select(left.columns.toSeq.map(col) ++
        rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
