package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard packaging — the step between a cleaned corpus and the
  * trainer's data loader: assign every document to one of `nShards`
  * shards DETERMINISTICALLY (content-addressed, not round-robin, so the
  * assignment is stable across re-runs, engines, and partitionings), and
  * emit the shard MANIFEST a loader validates against — per-shard doc /
  * token / byte counts plus an order-free integrity checksum (the
  * WebDataset / streaming-dataset discipline: the manifest travels with
  * the shards; a short read or a silently-dropped row breaks the
  * checksum, not the training run).
  *
  * Reference tie: the reference sizes its sink files by repartition
  * count (batch_process_Bronze_to_Silver.py:91) with no manifest; this
  * is the scale-correct replacement — assignment is a pure projection
  * (one md5 kernel per row, zero shuffle), the manifest one
  * nShards-group aggregation (map-side combined, nShards rows out).
  *
  * Cross-engine exactness: the shard id and checksum both derive from
  * `md5_lower64 >>> 33` (a 31-bit non-negative int — the q66 uniform's
  * dodge around signed/unsigned division differences), so DuckDB
  * reproduces them with `md5_number_lower(..) >> 33`; the checksum is an
  * integer SUM (associative, order-free — a float or concat checksum
  * would depend on row order, which no distributed engine guarantees).
  */
object Shards {

  /** 31-bit non-negative content hash of a string column. */
  private def h31(c: Column): Column =
    shiftrightunsigned(call_function("md5_lower64", c), 33)

  /** Deterministic shard id for `idCol`: hash-mod, uniform across shards
    * for any id distribution (sequential ids would make range-mod shards
    * correlate with crawl time). */
  def assign(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    df.withColumn("shard",
      pmod(h31(col(idCol).cast("string")), lit(nShards.toLong)))

  /** Shard manifest over an assigned corpus: one row per shard with
    * counts, token/byte mass, id range, and the order-free integrity
    * checksum sum(h31(id ':' n_chars)). `textCol` feeds the whitespace
    * token count (the budget unit packing and loaders plan against). */
  def manifest(assigned: DataFrame, idCol: String, textCol: String,
               charsCol: String): DataFrame =
    assigned
      .select(col("shard"), col(idCol).cast("string").as("__id"),
        coalesce(TextStats.tokenCount(col(textCol)).cast("long"), lit(0L))
          .as("__nt"),
        coalesce(col(charsCol).cast("long"), lit(0L)).as("__nc"),
        col(idCol).cast("long").as("__idn"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("__nt").as("n_tokens"),
        sum("__nc").as("n_chars"),
        min("__idn").as("min_id"),
        max("__idn").as("max_id"),
        sum(h31(concat(col("__id"), lit(":"), col("__nc")))).as("checksum"))
}
