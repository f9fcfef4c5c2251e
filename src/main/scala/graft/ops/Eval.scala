package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classifier ranking metrics (AUC / Gini / KS), distributed.
  *
  * The textbook formulas sort every scored row through one global
  * ORDER BY — a single-task window at 100 TB. This computes the same
  * numbers from the (group × quantized-score) CONTINGENCY GRID instead:
  * one map-side-combined groupBy collapses the fact table to at most
  * |groups| × |score domain| rows, and every window afterwards rides
  * that bounded grid, never the facts (the q234 domain-bounded-frame
  * discipline). Scores must arrive pre-quantized to integers — the
  * caller picks the quantum (1e-2 here keeps ≤ ~50k distinct cells for
  * a [0,500) value domain); metric error from quantization is zero for
  * AUC/KS whenever ties are already decided at that quantum, which is
  * the contract both engines replay.
  *
  * Exactness: counts and pair products stay integral end to end —
  * Mann-Whitney U is accumulated as 2U = Σ_s p(s)·(2·negBelow(s)+q(s))
  * on DECIMAL(38,0) (p·negBelow can pass 2^63 near ~10^10 rows: the
  * q232/q207 overflow lesson), and KS as max_s |cumP(s)·Q − cumQ(s)·P|
  * over the inclusive class CDFs, so both are a single exact integer
  * until the final division, floored to 1e-6 via the engine-portable
  * floor contract. Ties are handled with the standard half-credit
  * (midrank) convention: a positive tied with a negative contributes
  * 0.5 to U — AUC of a constant scorer is exactly 0.5.
  */
object Eval {

  private def round6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** One row per group: `groupCols ++ (n_pos, n_neg, auc, gini, ks)`.
    *
    * @param scoreCol integral (pre-quantized) score column
    * @param labelCol 0/1 integral label column
    * @param groupCols grouping keys; may be empty (one global row —
    *                  the grid then carries |score domain| rows, still
    *                  bounded). Groups with a degenerate class (no
    *                  positives or no negatives) are dropped: AUC is
    *                  undefined there, and a silent 0/0→null row would
    *                  read as data.
    */
  def rankingMetrics(df: DataFrame, scoreCol: String, labelCol: String,
                     groupCols: Seq[String]): DataFrame = {
    val gcols = groupCols.map(col)
    val d38 = "decimal(38,0)"
    val grid = df
      .groupBy((gcols :+ col(scoreCol)): _*)
      .agg(sum(col(labelCol)).as("__p"),
        sum(lit(1L) - col(labelCol)).as("__q"))
    // grid rows are unique per (group, score) — ORDER BY score is a
    // strict total order inside each partition, so every frame below
    // is deterministic
    val below = Window.partitionBy(gcols: _*).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val incl = Window.partitionBy(gcols: _*).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy(gcols: _*)
    // NB: names like __P/__Q would silently REPLACE __p/__q here —
    // withColumn resolves case-insensitively under Spark's default
    // spark.sql.caseSensitive=false
    val c = grid
      .withColumn("__negBelow", coalesce(sum(col("__q")).over(below), lit(0L)))
      .withColumn("__cumP", sum(col("__p")).over(incl))
      .withColumn("__cumQ", sum(col("__q")).over(incl))
      .withColumn("__ptot", sum(col("__p")).over(all))
      .withColumn("__qtot", sum(col("__q")).over(all))
    c.groupBy(gcols: _*)
      .agg(
        max(col("__ptot")).as("n_pos"),
        max(col("__qtot")).as("n_neg"),
        sum(col("__p").cast(d38) *
          (col("__negBelow") * 2 + col("__q")).cast(d38)).as("__u2"),
        max(abs(col("__cumP").cast(d38) * col("__qtot").cast(d38) -
          col("__cumQ").cast(d38) * col("__ptot").cast(d38))).as("__ksn"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .withColumn("auc", round6(col("__u2").cast("double") /
        (col("n_pos").cast("double") * col("n_neg").cast("double") * 2)))
      .withColumn("gini", round6(col("auc") * 2 - 1))
      .withColumn("ks", round6(col("__ksn").cast("double") /
        (col("n_pos").cast("double") * col("n_neg").cast("double"))))
      .drop("__u2", "__ksn")
  }
}
