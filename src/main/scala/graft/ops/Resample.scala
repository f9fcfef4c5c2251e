package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid gap fill + linear interpolation — the feature-store
  * resampling op (irregular event streams → a regular per-key time
  * grid a training pipeline can window over). The reference's
  * point-in-time machinery answers "the latest value AS OF t"
  * ([[PointInTime]]); a sequence model needs the dual: ONE ROW PER
  * (key, bucket) on a fixed cadence, holes filled from the
  * neighboring observations.
  *
  * Shape (all declarative — no driver loops, no UDFs):
  *  1. bucket observations to `bucketSec`-wide cells and average
  *     within a cell in INTEGER MICRO-UNITS (sum of quantized longs /
  *     count — order-insensitive, unlike a float `avg`);
  *  2. build each key's grid with `sequence(min, max)` + `explode` —
  *     the generator runs per key-row, distributed, never a driver
  *     range; a `raise_error` guard fail-fasts any span wider than
  *     `maxBuckets` (one key observed across years at second cadence
  *     would otherwise explode 31M rows from a single generator row —
  *     the [[RangeJoin]] pathological-interval discipline);
  *  3. left-join the grid to the observations on (key, bucket);
  *  4. two window passes over ONE (key × bucket-order) partitioning —
  *     last-non-null backward (prev value + its bucket) and
  *     first-non-null forward (next value + its bucket);
  *  5. fill: observed rows keep their value; interior holes get the
  *     linear interpolation prev + (next−prev)·(b−pb)/(nb−pb). Grid
  *     edges are observed by construction (the span IS min..max of
  *     observations), so every hole has both neighbors.
  *
  * Scale: one shuffle for the bucket aggregation, one for the per-key
  * span, one for the grid↔obs join, one partitioning carrying both
  * windows — all keyed by the entity key, so a 1000-executor run
  * spreads keys, and no state exceeds a key's grid span (capped by
  * `maxBuckets`). The interpolation arithmetic is one fixed double
  * expression tree over integer-derived inputs — an oracle replays it
  * bit-for-bit.
  */
object Resample {

  /** Regularize `df` to one row per (`keyCol`, bucket): bucket =
    * unix_seconds(`tsCol`) div `bucketSec`, value = micro-unit cell
    * mean of `valCol`, holes linearly interpolated. Output columns:
    * key, `bucket` (long), `value` (double, exact micro-unit-derived),
    * `observed` (boolean). Null keys/timestamps/values are dropped
    * before bucketing (the engine's NULL posture: impute upstream). */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String,
              valCol: String, bucketSec: Long,
              maxBuckets: Int = 100000): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val k = col(keyCol)
    // integer floor-div without Column's double `/` (whose rounding can
    // land a value just under a bucket boundary IN the next bucket):
    // (sec - sec mod b) is an exact multiple of b <= 2^53, so the double
    // division is exact by IEEE, and the cast is a no-op truncation
    val sec = unix_timestamp(col(tsCol)).cast("long")
    val bkt = ((sec - pmod(sec, lit(bucketSec))) / lit(bucketSec))
      .cast("long")
    // persisted: the bucketed observations are referenced TWICE below
    // (the per-key span aggregation AND the grid join) and the two
    // references share no exchange the optimizer can reuse (one goes
    // through a further aggregate into a broadcast), so uncached the
    // source scan + cell aggregation execute twice (the q231
    // own-your-input-caching lesson). The frame is (keys × observed
    // buckets) — already aggregated, far smaller than the input; the
    // bench's per-query clearCache releases it.
    val obs = df
      .filter(k.isNotNull && col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(k, bkt.as("bucket"))
      .agg(sum(floor(col(valCol) * 1e6 + 0.5).cast("long")).as("__s6"),
        count(lit(1)).as("__c"))
      .select(k, col("bucket"),
        (col("__s6").cast("double") / (col("__c") * lit(1e6))).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val span = obs.groupBy(k)
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
    val grid = span.select(k,
      explode(sequence(col("__b0"),
        when(col("__b1") - col("__b0") < maxBuckets, col("__b1"))
          .otherwise(raise_error(concat(lit(
            s"gapFill: key span exceeds maxBuckets=$maxBuckets for key "),
            k.cast("string")))))).as("bucket"))
    val j = grid.join(obs, Seq(keyCol, "bucket"), "left")
    val back = Window.partitionBy(k).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(k).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsB = when(col("__v").isNotNull, col("bucket"))
    val pv = last(col("__v"), ignoreNulls = true).over(back)
    val pb = last(obsB, ignoreNulls = true).over(back)
    val nv = first(col("__v"), ignoreNulls = true).over(fwd)
    val nb = first(obsB, ignoreNulls = true).over(fwd)
    j.select(k, col("bucket"),
      when(col("__v").isNotNull, col("__v"))
        .otherwise(pv + (nv - pv) * (col("bucket") - pb).cast("double") /
          (nb - pb).cast("double")).as("value"),
      col("__v").isNotNull.as("observed"))
  }
}
