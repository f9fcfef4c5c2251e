package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy sequence packing for training-batch construction: assign each
  * document to a pack of <= `budget` tokens, streaming within each source
  * in id order (the standard first-fit approximation — a boundary doc
  * spills into the next pack and the trainer truncates). pack_id =
  * floor(running-total-before-this-doc / budget).
  *
  * Two formulations with IDENTICAL output (PackSpec asserts equality):
  *
  *  - [[packWindowed]] — ONE window cumsum per source. Parallelism is
  *    capped at #sources: at 100 TB one source's docs form ONE window
  *    partition that a single task must externally sort and scan. Kept as
  *    the independent fixture-scale ground truth, NOT the scale path.
  *
  *  - [[packSequences]] — distributed prefix sum. Each source's id span is
  *    cut into `ranges` order-preserving buckets; per-bucket token totals
  *    (a tiny #sources x ranges aggregate) turn into cumulative bucket
  *    offsets via a window over that tiny table; the offsets broadcast
  *    back and each bucket computes its LOCAL cumsum independently.
  *    cum_before = bucket_offset + local_before. Parallelism is
  *    #sources x ranges — scales with rows, not with #sources — and every
  *    per-row stage is a projection or a bucket-local window; the only
  *    global structures are two aggregates whose size is #sources and
  *    #sources x ranges.
  *
  * Semantics notes (both paths): rows ordered by `idCol` within a source;
  * duplicate ids within one source make the cumsum order nondeterministic
  * (same caveat as any order-by-non-unique-key window). Null `sourceCol`
  * forms its own group (null-safe joins mirror the window's null
  * partition). Null `idCol` rows sort BEFORE all non-null ids within their
  * source on both paths (Spark's ascending nulls-first; the distributed
  * path assigns them bucket -1) and among themselves carry the same
  * nondeterminism as duplicate ids. `tokensCol` must be non-null (coalesce
  * upstream, as q65 does) and ids within one source must span < 2^63.
  */
object Pack {

  /** Reference formulation: per-source window cumsum. Fixture-scale ground
    * truth — see object Scaladoc for why this is NOT the scale path. */
  def packWindowed(df: DataFrame, idCol: String, sourceCol: String,
                   tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(sourceCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum_before",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("pack_id",
        floor(col("__cum_before") / budget).cast("long"))
      .drop("__cum_before")
  }

  /** Scale formulation: range-partitioned distributed prefix sum.
    *
    * @param ranges order-preserving buckets per source; <= 0 reads
    *               `spark.graft.pack.ranges` (default: the session's
    *               shuffle parallelism). Any value >= 1 produces identical
    *               output — it is purely a parallelism knob.
    *
    * Execution note: the two tiny cross-partition structures (per-source
    * bounds, per-bucket offsets) are collected EAGERLY and re-entered as
    * local relations — calling this triggers two driver-sized jobs before
    * the returned frame is consumed. The broadcast joins below were
    * shipping exactly those rows to the driver anyway, so this adds no
    * driver memory; what it removes is any multi-consumer dependency on
    * `df`, so nothing is cached and nothing leaks across invocations
    * (earlier revisions held a MEMORY_AND_DISK cache for the JVM
    * lifetime). The price is three column-pruned passes over `df` (bounds:
    * source+id; offsets: source+id+tokens; output: all) instead of one
    * scan plus a full materialized cache — at 100 TB, pruned re-scans of
    * columnar input beat writing the dataset to cache storage. Callers
    * whose `df` has EXPENSIVE non-source lineage should cache it
    * themselves around the call — the lifecycle belongs to the owner.
    */
  def packSequences(df: DataFrame, idCol: String, sourceCol: String,
                    tokensCol: String, budget: Long,
                    ranges: Int = -1): DataFrame = {
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    // collect a driver-sized frame and re-enter it as a local relation so
    // downstream use is a plan literal, not a second consumer of `df`
    def toLocal(d: DataFrame): DataFrame =
      spark.createDataFrame(d.collect().toSeq.asJava, d.schema)
    val nRanges =
      if (ranges > 0) ranges
      else {
        val raw = spark.conf.get("spark.graft.pack.ranges",
          spark.conf.get("spark.sql.shuffle.partitions", "32"))
        try math.max(raw.toInt, 1) catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"spark.graft.pack.ranges must be an int, got '$raw'")
        }
      }
    val src = col(sourceCol)
    val id = col(idCol)
    // Per-source id bounds: one tiny row per source (map-side partial agg).
    // Bucket width is computed here in decimal so a full-long id span
    // cannot overflow; floor((id - lo) / width) is then plain long math.
    val bounds = toLocal(df.groupBy(src.as("__src"))
      .agg(min(id).as("__lo"), max(id).as("__hi"))
      .withColumn("__width",
        greatest(ceil((col("__hi").cast("decimal(38,0)") - col("__lo") + 1)
          / nRanges).cast("long"), lit(1L)))
      .select(col("__src"), col("__lo"), col("__width")))
    // Order-preserving bucket: all ids in bucket r sort before bucket r+1.
    // Null ids take bucket -1 — they sort before every real bucket, exactly
    // where the windowed path's ascending nulls-first ordering puts them.
    def bucketize(d: DataFrame): DataFrame = d
      .join(broadcast(bounds), src <=> col("__src"))
      .withColumn("__rng",
        // (id - lo) >= 0 and width >= 1; decimal division keeps the bucket
        // exact for full-long id spans (double division loses bits > 2^53)
        when(id.isNull, lit(-1)).otherwise(
          floor((id - col("__lo")).cast("decimal(38,0)") / col("__width"))
            .cast("int")))
      .drop("__src", "__lo", "__width")
    // Tiny cross-bucket structure: #sources x nRanges rows. The window
    // below runs over THAT table only — never over the data.
    val offsets = toLocal(bucketize(df)
      .groupBy(src.as("__osrc"), col("__rng").as("__orng"))
      .agg(sum(col(tokensCol)).as("__rtot"))
      .withColumn("__offset",
        coalesce(sum(col("__rtot")).over(
          Window.partitionBy("__osrc").orderBy("__orng")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__osrc"), col("__orng"), col("__offset")))
    // Bucket-local cumsum — parallelism = #sources x nRanges. __rng is
    // never null (bucket -1 stands in), so plain equality is exact.
    val wLocal = Window.partitionBy(src, col("__rng")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketize(df)
      .join(broadcast(offsets),
        src <=> col("__osrc") && col("__rng") === col("__orng"))
      .withColumn("__cum_before",
        col("__offset") +
          coalesce(sum(col(tokensCol)).over(wLocal), lit(0L)))
      .withColumn("pack_id",
        floor(col("__cum_before") / budget).cast("long"))
      .drop("__osrc", "__orng", "__offset", "__rng", "__cum_before")
  }
}
