package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for Zipfian keys (AliCCP user_id/item_id — vocab counts
  * at batch_process_Silver_to_Gold.py:161-162 imply heavy head skew).
  *
  * AQE's skew-join split handles sort-merge joins adaptively
  * (GraftSession enables it); these explicit tools cover the cases AQE
  * can't: aggregation hot keys and joins where the build side must be
  * replicated.
  */
object Skew {

  /** Salted equi-join: the skewed (large) left side gets a uniform random
    * salt in [0, buckets); the right side is replicated `buckets`× with
    * every salt value, then the join key becomes (key, salt) — a hot key's
    * rows now spread over `buckets` reducers instead of one. Right side
    * should be the smaller input (its size multiplies by `buckets`).
    *
    * Correct for inner/left joins on equality keys: every left row still
    * meets every right row of its key exactly once. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    val l = left.withColumn("__salt", (rand(42) * buckets).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, key :+ "__salt", joinType).drop("__salt")
  }

  /** Measured hot-key detector — the a-priori salting decision becomes a
    * measurement. One Misra-Gries pass ([[graft.llm.Sketches]], bounded
    * k-entry state, no groupBy over the full key space) surfaces every
    * key whose share of `df` MIGHT reach `minShare`: a key is returned
    * when its frequency UPPER bound (count + off) clears minShare·N —
    * the safe over-approximation for deciding [[saltedJoin]]/
    * [[saltedAgg]] buckets (a false positive salts a warm key
    * harmlessly; a false negative would leave a hot key serialized,
    * so the guarantee direction matters: every truly-hot key IS
    * returned, because MG's undercount is at most off). Requires
    * minShare > 1/(k+1) — below that the sketch cannot promise
    * membership. Entries come back hottest-first with their lower-bound
    * counts; `n` is the exact row count for share arithmetic. */
  def hotKeys(df: DataFrame, keyCol: String, minShare: Double,
              k: Int = 256): (Seq[graft.llm.Sketches.HeavyHitter], Long) = {
    require(minShare > 1.0 / (k + 1),
      f"minShare $minShare%.4f below the MG guarantee 1/(k+1)=${1.0 / (k + 1)}%.4f — raise k")
    val (entries, off, n) = graft.llm.Sketches.heavyHittersOrdered(df, keyCol, k)
    (entries.filter(h => h.count + off >= (minShare * n).toLong), n)
  }

  /** Measure-THEN-salt equi-join — [[hotKeys]] wired to [[saltedJoin]]:
    * one bounded-state MG pass over the left side's key decides whether
    * the replication cost of salting is warranted at all. No hot key →
    * a plain join (zero overhead); any key whose share upper bound
    * clears `minShare` → the salted join (hot keys spread over
    * `buckets` reducers). Returns whether salting fired so callers can
    * log/audit the decision. The guarantee direction is inherited from
    * hotKeys: a truly-hot key can never slip through unsalted. */
  def autoSaltedJoin(left: DataFrame, right: DataFrame, key: String,
                     buckets: Int, minShare: Double = 0.05, k: Int = 256,
                     joinType: String = "inner"): (DataFrame, Boolean) = {
    val (hot, _) = hotKeys(left, key, minShare, k)
    if (hot.nonEmpty)
      (saltedJoin(left, right, Seq(key), buckets, joinType), true)
    else (left.join(right, Seq(key), joinType), false)
  }

  /** Two-phase (salted) aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. Spark's hash aggregate already does
    * map-side partial aggregation; the explicit salt phase additionally
    * splits a hot key across REDUCERS, which matters when one key's
    * partials alone overwhelm a single task at the final stage.
    *
    * `partial` must be decomposable with `merge` (e.g. count/sum/min/max:
    * partial=count, merge=sum). */
  def saltedAgg(df: DataFrame, key: Seq[String], buckets: Int,
                partial: Column => Column, merge: Column => Column,
                valueCol: String, as: String): DataFrame = {
    val salted = df.withColumn("__salt", (rand(42) * buckets).cast("int"))
    salted.groupBy((key :+ "__salt").map(col): _*)
      .agg(partial(col(valueCol)).as("__p"))
      .groupBy(key.map(col): _*)
      .agg(merge(col("__p")).as(as))
  }
}
