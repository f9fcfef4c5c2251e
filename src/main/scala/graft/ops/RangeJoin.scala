package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless range joins, bucketized — the join family Spark itself has no
  * scale-safe physical strategy for: a bare `a.join(b, pt BETWEEN lo AND
  * hi)` (no equi key) compiles to BroadcastNestedLoopJoin — O(n·m)
  * comparisons and a full broadcast of one side, the exact plan shape
  * `PlanAuditSpec` exists to outlaw. The standard cure (the same
  * technique behind Databricks' range-join optimization and spatial
  * grid joins): quantize the value domain into fixed-width buckets,
  * explode each interval to the buckets it covers, map each point to
  * its one bucket, and ride a plain shuffled EQUI-join on the bucket id
  * with the exact predicate as a post-filter. Candidate mass is
  * Σ per-bucket products — data-local, never n·m — and the join
  * partitions/parallelizes like any other shuffle.
  *
  * q52's interval join doesn't need this (it has `user_id` as an equi
  * key; the range is a post-filter on an already-keyed join) — this
  * operator is for the KEYLESS case: price-band lookups, time-window
  * containment without a shared entity, overlap joins.
  *
  * Exactness: bucketing only generates CANDIDATES — the exact
  * containment/overlap predicate filters them, so results are
  * byte-identical to the nested-loop semantics an oracle replays with a
  * plain `BETWEEN`/overlap join. Each qualifying pair surfaces EXACTLY
  * once: a point has one bucket (so containment pairs can't duplicate),
  * and overlap pairs are pinned to the first shared bucket — the bucket
  * of `max(aLo, bLo)`, which provably lies in both intervals' covering
  * ranges — instead of a post-hoc `distinct`.
  *
  * Sizing `bucketWidth`: choose ≈ the typical interval length — an
  * interval then explodes to ~2 bucket rows. The cost model is
  * (intervals × avg buckets per interval) exploded rows and per-bucket
  * candidate products; a domain-wide interval under a narrow width
  * explodes domain/width rows, so [[MaxBucketsPerInterval]] fails fast
  * (raise_error, not OOM) on pathological inputs. At extreme scale a
  * popular bucket bounds parallelism (all candidates for one bucket
  * meet in one partition); the standard extension is a salt on the
  * point side replicated on the interval side — [[graft.ops.Skew]]'s
  * discipline — which callers can apply to the bucket column before the
  * join if a domain is that hot.
  */
object RangeJoin {

  /** Fail-fast ceiling on how many buckets one interval may cover: a
    * crafted or mis-sized interval must error, never explode the stage. */
  val MaxBucketsPerInterval: Long = 65536L

  private def bucketOf(c: Column, w: Double): Column =
    floor(c.cast("double") / lit(w)).cast("long")

  /** Rows of `points` ⋈ `intervals` where `points(ptCol)` lies in
    * [loCol, hiCol] (inclusive both ends) — inner semantics; compose
    * outer behavior (e.g. keep zero-match intervals) with a join back on
    * the caller's side. NULL points and NULL/inverted intervals drop.
    * All columns of both inputs survive; callers alias clashes away
    * first. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    val nb = bucketOf(col(hiCol), bucketWidth) -
      bucketOf(col(loCol), bucketWidth) + 1
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__rj_b", explode(sequence(
        bucketOf(col(loCol), bucketWidth),
        when(nb > MaxBucketsPerInterval, raise_error(concat(
          lit(s"rangeJoin: interval covers more than $MaxBucketsPerInterval" +
            " buckets (width too small for ["), col(loCol), lit(","),
          col(hiCol), lit("])"))))
          .otherwise(bucketOf(col(hiCol), bucketWidth)))))
    val pt = points.filter(col(ptCol).isNotNull)
      .withColumn("__rj_b", bucketOf(col(ptCol), bucketWidth))
    pt.join(iv, Seq("__rj_b"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__rj_b")
  }

  /** Rows of `a` ⋈ `b` where [aLo, aHi] and [bLo, bHi] OVERLAP
    * (aLo ≤ bHi ∧ bLo ≤ aHi, closed intervals) — inner semantics.
    * Exactly-once via the first-shared-bucket pin: the overlap's start
    * `max(aLo, bLo)` lies inside both intervals, so its bucket appears
    * in both covering ranges and no other shared bucket is kept. */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
                      b: DataFrame, bLo: String, bHi: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    def cover(df: DataFrame, lo: String, hi: String): DataFrame = {
      val nb = bucketOf(col(hi), bucketWidth) -
        bucketOf(col(lo), bucketWidth) + 1
      df.filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
        .withColumn("__rj_b", explode(sequence(
          bucketOf(col(lo), bucketWidth),
          when(nb > MaxBucketsPerInterval, raise_error(
            lit(s"rangeJoin: interval covers more than " +
              s"$MaxBucketsPerInterval buckets")))
            .otherwise(bucketOf(col(hi), bucketWidth)))))
    }
    cover(a, aLo, aHi).join(cover(b, bLo, bHi), Seq("__rj_b"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__rj_b") ===
        bucketOf(greatest(col(aLo), col(bLo)), bucketWidth))
      .drop("__rj_b")
  }
}
