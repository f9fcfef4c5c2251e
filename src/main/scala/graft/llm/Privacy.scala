package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-release privacy checks — the governance gate a training
  * corpus passes before quasi-identifier columns (language, source,
  * length, region, ...) ship alongside content: k-anonymity requires
  * every released quasi-identifier combination to describe at least k
  * rows, or an attacker joins the "anonymous" release back to
  * individuals on those columns (Sweeney 2002). Complements [[Redact]]
  * (which scrubs direct identifiers; quasi-identifiers are the ones that
  * only identify in COMBINATION).
  */
object Privacy {

  /** Full-domain generalization then suppression: `ladder` is a sequence
    * of quasi-identifier projections, finest first, each one level
    * coarser (the classic recoding ladder — raw value, bucketed value,
    * wider bucket, fully generalized). The FIRST level whose every group
    * reaches `k` is chosen globally (full-domain recoding: one level for
    * all rows — deterministic, and the level choice is replayable by an
    * external oracle, unlike per-partition local recoding); if no level
    * satisfies k, the coarsest is chosen and its residual small groups
    * are marked `suppressed` (their rows must not be released).
    *
    * Cost: one aggregation per probed level (stops at the first
    * satisfying level) + one driver-sized min per probe — group counts
    * only, no row data leaves the executors. Returns (chosenLevel,
    * groups-with-n-and-suppressed). NULL quasi values form groups like
    * any other value (both engines' GROUP BY semantics). */
  def kAnonymize(df: DataFrame, ladder: Seq[Seq[Column]], k: Long):
      (Int, DataFrame) = {
    require(ladder.nonEmpty, "kAnonymize needs at least one ladder level")
    val counts = ladder.map(q =>
      df.groupBy(q: _*).agg(count(lit(1)).as("n")))
    val satisfied = counts.indexWhere { g =>
      val m = g.agg(min("n")).head()
      m.isNullAt(0) || m.getLong(0) >= k
    }
    val chosen = if (satisfied == -1) ladder.size - 1 else satisfied
    (chosen,
      counts(chosen)
        .withColumn("level", lit(chosen))
        .withColumn("suppressed", col("n") < k))
  }
}
