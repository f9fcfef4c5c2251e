package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints over a table — the publish gate
  * a production pipeline runs before a silver/gold table goes live
  * (the reference publishes unchecked,
  * /root/reference/data_processing/batch_processing/
  * batch_process_Bronze_to_Silver.py:317 — one malformed ingest lands
  * directly in training data). Each run returns one row per check:
  * (check, violations, total, rate, pass) — machine-readable, joinable
  * into audit logs, and cheap enough to run on every batch.
  *
  * Scale shape: ALL row-level checks (null-rate, range) share ONE
  * aggregate pass over the table — conditional sums in a single
  * map-side-combined aggregation, the [[Scaler.fit]] discipline — so
  * adding a tenth check costs a column, not a scan. Uniqueness is one
  * groupBy (partial aggregation, one shuffle); referential integrity is
  * one left-anti join (AQE broadcasts the dimension when small). No
  * driver materialization beyond the per-check one-row results.
  *
  * Determinism: violations/totals are exact integer counts; the
  * REPORTED `rate` is one IEEE divide rounded by the engine-standard
  * floor(x·1e6+0.5)/1e6; `pass` compares the UNROUNDED rate against the
  * declared threshold — rounding the gate itself would let a nonzero
  * violation count under ~5e-7 (one bad row in a >2M-row table — i.e.
  * exactly the 100 TB regime) round to 0.0 and silently pass a
  * zero-tolerance check. All replayable by an external oracle (q137).
  */
object Checks {

  sealed trait Check { def name: String }

  /** NULL fraction of `column` must be ≤ `maxNullRate`. */
  final case class NotNull(column: String, maxNullRate: Double = 0.0)
      extends Check { val name = s"not_null:$column" }

  /** Every NON-NULL value of `column` must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check { val name = s"in_range:$column" }

  /** `columns` must be a unique key: violations = rows beyond the first
    * of each duplicated key (NULL keys group like values, as a
    * deduplication would treat them). */
  final case class Unique(columns: Seq[String]) extends Check {
    val name = s"unique:${columns.mkString(",")}"
  }

  /** Every non-null `column` value must exist in `ref(refColumn)`:
    * violations = orphan rows. */
  final case class RefIntegrity(column: String, ref: DataFrame,
                                refColumn: String) extends Check {
    val name = s"ref:$column"
  }

  private def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** violations/total, unrounded — the gate input; an EMPTY table has
    * rate 0 (vacuously clean), not NaN. The reported column is the
    * rounded [[rate]]. */
  private def rawRate(v: Column, total: Column): Column =
    when(total === 0L, lit(0.0)).otherwise(v.cast("double") / total)

  /** violations/total as a 6-decimal reporting rate. */
  private def rate(v: Column, total: Column): Column =
    when(total === 0L, lit(0.0)).otherwise(r6(v.cast("double") / total))

  /** Evaluate `checks` against `df`; one result row per check. Row ORDER
    * is unspecified (frames are unioned, and union order is not a Spark
    * contract anyway) — callers wanting a stable presentation sort on
    * `check` themselves, as q137 does. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val rowLevel = checks.collect {
      case c: NotNull => c.name ->
        (sum(when(col(c.column).isNull, 1L).otherwise(0L)), lit(c.maxNullRate))
      case c: InRange => c.name ->
        (sum(when(col(c.column).isNotNull &&
          (col(c.column) < c.lo || col(c.column) > c.hi), 1L).otherwise(0L)),
          lit(0.0))
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowLevel.nonEmpty) {
      val aggs = rowLevel.map { case (n, (v, _)) => v.as(s"__v_$n") } :+
        count(lit(1)).as("__total")
      val one = df.agg(aggs.head, aggs.tail: _*)
      rowLevel.foreach { case (n, (_, thresh)) =>
        val v = coalesce(col(s"__v_$n"), lit(0L)) // empty table: sum is NULL
        frames += one.select(lit(n).as("check"),
          v.as("violations"), col("__total").as("total"),
          rate(v, col("__total")).as("rate"),
          (rawRate(v, col("__total")) <= thresh).as("pass"))
      }
    }
    checks.foreach {
      case c: Unique =>
        val dups = df.groupBy(c.columns.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"),
            coalesce(sum(col("__n")), lit(0L)).as("total"))
        frames += dups.select(lit(c.name).as("check"), col("violations"),
          col("total"),
          rate(col("violations"), col("total")).as("rate"),
          (col("violations") === 0L).as("pass"))
      case c: RefIntegrity =>
        // ONE pass: left join against the distinct reference keys, then
        // total and orphan counts from the same aggregate — no anti join
        // plus a second count scan, no one-row cross join
        val nonNull = df.filter(col(c.column).isNotNull)
        val counts = nonNull.join(
            c.ref.select(col(c.refColumn).as("__rk")).distinct(),
            col(c.column) === col("__rk"), "left")
          .agg(sum(when(col("__rk").isNull, 1L).otherwise(0L))
            .as("violations"), count(lit(1)).as("total"))
        frames += counts.select(lit(c.name).as("check"),
          coalesce(col("violations"), lit(0L)).as("violations"),
          col("total"),
          rate(coalesce(col("violations"), lit(0L)), col("total")).as("rate"),
          (coalesce(col("violations"), lit(0L)) === 0L).as("pass"))
      case _ => () // row-level, handled above
    }
    frames.reduce(_ unionByName _)
  }
}
