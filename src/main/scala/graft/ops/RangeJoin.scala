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
  * (raise_error, not OOM) on pathological inputs.
  *
  * Skew: at extreme scale a popular bucket bounds parallelism — ALL
  * candidates for one bucket meet in one reduce partition. Pass
  * `saltBuckets > 1` to spread it: the point side (resp. side `a`)
  * gets a deterministic per-row salt in [0, saltBuckets) and the other
  * side is replicated saltBuckets×, so a hot bucket's candidate work
  * fans out over saltBuckets reducers — the [[graft.ops.Skew]]
  * discipline, results byte-identical (every candidate pair still meets
  * exactly once, on exactly one (bucket, salt) key). The salt is a hash
  * of the salted side's whole row, so byte-identical duplicate rows
  * share a salt — dedup such rows first if they ARE the skew. Cost:
  * the replicated side's exploded bucket rows multiply by saltBuckets;
  * salt only when a measured hot bucket warrants it
  * ([[Skew.hotKeys]] on the bucket column is the measurement).
  */
object RangeJoin {

  /** Fail-fast ceiling on how many buckets one interval may cover: a
    * crafted or mis-sized interval must error, never explode the stage. */
  val MaxBucketsPerInterval: Long = 65536L

  /** Internal join-key columns; inputs must not collide with them — a
    * silent `withColumn` replacement would corrupt both the join and the
    * caller's data (the columns are dropped from the output). */
  private val BucketCol = "__rj_b"
  private val SaltCol = "__rj_s"

  private def checkReserved(df: DataFrame, side: String): DataFrame = {
    Seq(BucketCol, SaltCol).foreach { c =>
      require(!df.columns.contains(c),
        s"rangeJoin: $side input already has a column named '$c' " +
          "(reserved for the internal bucket/salt keys); rename it first")
    }
    df
  }

  private def bucketOf(c: Column, w: Double): Column =
    floor(c.cast("double") / lit(w)).cast("long")

  /** Deterministic per-row salt in [0, n): hash of the whole row. */
  private def saltOf(df: DataFrame, n: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(n.toLong))
      .cast("int")

  /** Explode `df` to one row per (row, salt) for salt in [0, n). */
  private def replicated(n: Int): Column =
    explode(sequence(lit(0), lit(n - 1)))

  /** Rows of `points` ⋈ `intervals` where `points(ptCol)` lies in
    * [loCol, hiCol] (inclusive both ends) — inner semantics; compose
    * outer behavior (e.g. keep zero-match intervals) with a join back on
    * the caller's side. NULL points and NULL/inverted intervals drop.
    * All columns of both inputs survive; callers alias clashes away
    * first. `saltBuckets > 1` spreads hot buckets (see class doc). */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double, saltBuckets: Int = 1): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    require(saltBuckets >= 1, s"saltBuckets $saltBuckets must be >= 1")
    checkReserved(points, "points"); checkReserved(intervals, "intervals")
    val nb = bucketOf(col(hiCol), bucketWidth) -
      bucketOf(col(loCol), bucketWidth) + 1
    val iv0 = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn(BucketCol, explode(sequence(
        bucketOf(col(loCol), bucketWidth),
        when(nb > MaxBucketsPerInterval, raise_error(concat(
          lit(s"rangeJoin: interval covers more than $MaxBucketsPerInterval" +
            " buckets (width too small for ["), col(loCol), lit(","),
          col(hiCol), lit("])"))))
          .otherwise(bucketOf(col(hiCol), bucketWidth)))))
    val pt0 = points.filter(col(ptCol).isNotNull)
    val (pt, iv, keys) =
      if (saltBuckets == 1)
        (pt0.withColumn(BucketCol, bucketOf(col(ptCol), bucketWidth)),
          iv0, Seq(BucketCol))
      else
        (pt0.withColumn(SaltCol, saltOf(pt0, saltBuckets))
          .withColumn(BucketCol, bucketOf(col(ptCol), bucketWidth)),
          iv0.withColumn(SaltCol, replicated(saltBuckets)),
          Seq(BucketCol, SaltCol))
    pt.join(iv, keys)
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop(BucketCol, SaltCol)
  }

  /** Rows of `a` ⋈ `b` where [aLo, aHi] and [bLo, bHi] OVERLAP
    * (aLo ≤ bHi ∧ bLo ≤ aHi, closed intervals) — inner semantics.
    * Exactly-once via the first-shared-bucket pin: the overlap's start
    * `max(aLo, bLo)` lies inside both intervals, so its bucket appears
    * in both covering ranges and no other shared bucket is kept.
    * `saltBuckets > 1` salts side `a` per row and replicates side `b`
    * (put the larger input on `a`; see class doc). */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
                      b: DataFrame, bLo: String, bHi: String,
                      bucketWidth: Double, saltBuckets: Int = 1): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    require(saltBuckets >= 1, s"saltBuckets $saltBuckets must be >= 1")
    checkReserved(a, "a"); checkReserved(b, "b")
    def cover(df: DataFrame, lo: String, hi: String): DataFrame = {
      val nb = bucketOf(col(hi), bucketWidth) -
        bucketOf(col(lo), bucketWidth) + 1
      df.filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
        .withColumn(BucketCol, explode(sequence(
          bucketOf(col(lo), bucketWidth),
          when(nb > MaxBucketsPerInterval, raise_error(
            lit(s"rangeJoin: interval covers more than " +
              s"$MaxBucketsPerInterval buckets")))
            .otherwise(bucketOf(col(hi), bucketWidth)))))
    }
    val (ca, cb, keys) =
      if (saltBuckets == 1) (cover(a, aLo, aHi), cover(b, bLo, bHi),
        Seq(BucketCol))
      else {
        val a0 = a.withColumn(SaltCol, saltOf(a, saltBuckets))
        (cover(a0, aLo, aHi),
          cover(b, bLo, bHi).withColumn(SaltCol, replicated(saltBuckets)),
          Seq(BucketCol, SaltCol))
      }
    ca.join(cb, keys)
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col(BucketCol) ===
        bucketOf(greatest(col(aLo), col(bLo)), bucketWidth))
      .drop(BucketCol, SaltCol)
  }
}
