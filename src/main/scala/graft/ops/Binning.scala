package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.Sketches

/** Sketch-driven quantile binning — the feature-engineering op that
  * turns a numeric column into equal-population bucket ids (the
  * nvtabular/feature-store "bucketize by quantiles" staple, which the
  * reference's exact-string Categorify cannot express): ONE histogram-
  * sketch pass fits B−1 cut points, the cuts enter the transform as
  * PLAN LITERALS (the [[Scaler]] discipline — join-free, the
  * projection stays in WholeStageCodegen), and each row's bucket is
  * the count of cuts at or below its value.
  *
  * Cuts come from the [[Sketches.histQuantile]] midpoint map, so they
  * are grid-resolution approximations of the true quantiles —
  * deterministic, order-insensitive and oracle-replayable, unlike an
  * exact-sort fit (whose full-column sort is also the thing a 100 TB
  * fit cannot afford; the sketch pass is one scan with kilobyte
  * state). Duplicate cuts (a value mass straddling several quantiles)
  * collapse naturally — affected buckets are simply empty. */
object Binning {

  /** Fit B−1 cut points for `nBuckets` equal-population buckets from a
    * [lo, hi) × bins histogram sketch of `colName`. One scan, one
    * one-row collect (the bounded-by-construction Scaler shape).
    * Non-null, non-NaN input required (the histogram contract). */
  def fitCuts(df: DataFrame, colName: String, lo: Double, hi: Double,
              bins: Int, nBuckets: Int): Array[Double] = {
    require(nBuckets >= 2, "need at least 2 buckets")
    val sk = df.agg(Sketches.histogram(col(colName), lo, hi, bins).as("sk"))
    val row = sk.select((1 until nBuckets).map(i =>
      Sketches.histQuantile(col("sk"), lo, hi, bins,
        i.toDouble / nBuckets).as(s"c$i")): _*).head()
    (0 until nBuckets - 1).map(row.getDouble).toArray
  }

  /** Join-free bucketize: bucket = #cuts ≤ value, every comparison a
    * plan literal. NULL in, NULL out. */
  def bucketize(c: Column, cuts: Array[Double]): Column =
    when(c.isNotNull,
      cuts.foldLeft(lit(0)) { (acc, cut) =>
        acc + when(c >= cut, 1).otherwise(0)
      }.cast("long"))
}
