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
  * partition). `tokensCol` must be non-null (coalesce upstream, as q65
  * does) and ids within one source must span < 2^63.
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
    * Memory note: the bucketed input is cached (MEMORY_AND_DISK — spills,
    * never OOMs) because two consumers read it: the per-bucket totals
    * aggregate and the bucket-local cumsum. The cache carries ALL of
    * `df`'s columns, so pre-project to (id, source, tokens) before
    * calling — as q65 does — rather than packing a wide dataframe.
    */
  def packSequences(df: DataFrame, idCol: String, sourceCol: String,
                    tokensCol: String, budget: Long,
                    ranges: Int = -1): DataFrame = {
    val spark = df.sparkSession
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
    val bounds = df.groupBy(src.as("__src"))
      .agg(min(id).as("__lo"), max(id).as("__hi"))
      .withColumn("__width",
        greatest(ceil((col("__hi").cast("decimal(38,0)") - col("__lo") + 1)
          / nRanges).cast("long"), lit(1L)))
      .select(col("__src"), col("__lo"), col("__width"))
    // Order-preserving bucket: all ids in bucket r sort before bucket r+1.
    val bucketed = df
      .join(broadcast(bounds), src <=> col("__src"))
      .withColumn("__rng",
        // (id - lo) >= 0 and width >= 1; decimal division keeps the bucket
        // exact for full-long id spans (double division loses bits > 2^53)
        floor((id - col("__lo")).cast("decimal(38,0)") / col("__width"))
          .cast("int"))
      .drop("__src", "__lo", "__width")
    bucketed.cache() // two consumers: bucket totals + the local cumsum
    // Tiny cross-bucket structure: #sources x nRanges rows. The window
    // below runs over THAT table only — never over the data.
    val offsets = bucketed
      .groupBy(src.as("__osrc"), col("__rng").as("__orng"))
      .agg(sum(col(tokensCol)).as("__rtot"))
      .withColumn("__offset",
        coalesce(sum(col("__rtot")).over(
          Window.partitionBy("__osrc").orderBy("__orng")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__osrc"), col("__orng"), col("__offset"))
    // Bucket-local cumsum — parallelism = #sources x nRanges.
    val wLocal = Window.partitionBy(src, col("__rng")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = bucketed
      .join(broadcast(offsets),
        src <=> col("__osrc") && col("__rng") === col("__orng"))
      .withColumn("__cum_before",
        col("__offset") +
          coalesce(sum(col(tokensCol)).over(wLocal), lit(0L)))
      .withColumn("pack_id",
        floor(col("__cum_before") / budget).cast("long"))
      .drop("__osrc", "__orng", "__offset", "__rng", "__cum_before")
    out
  }
}
