package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver-generated parquet fixtures (TESTDATA.md).
  *
  * One parquet dir per table under the scale-factor dir. `events.ts` is
  * nanosecond-precision; with `spark.sql.legacy.parquet.nanosAsLong=true`
  * it surfaces as a BIGINT epoch-nanos column — all graft event-time logic
  * uses integer micros (`ts_us`) so comparisons are exact across engines.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Fan a fixture scan out to all cores BEFORE heavy per-row compute.
    *
    * Every fixture file is a SINGLE parquet row group, so the raw scan is
    * one partition and per-row compute (KV parse, JSON codec, kernels)
    * would run on one of 32 cores until the first shuffle. Real deployments
    * get scan parallelism from file/row-group splits; this round-robin
    * fan-out is the harness-side equivalent for the fixtures (a few MB of
    * shuffle). Use it ONLY where parse/codec work dominates: it sits above
    * the scan, so pushable filters must be applied by the caller BEFORE
    * widening (or pushdown is lost) — and at 100 TB an unconditional
    * repartition-after-scan would be a pointless full-data shuffle. */
  def wide(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = apply(spark, sfDir, name)
    val cores = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores / 2) df.repartition(cores) else df
  }

  /** events with `ts_us` (epoch micros, BIGINT) derived from the nano ts.
    * Integer `div`, not `/`: epoch-nanos (~1.7e18) exceed double's 2^53
    * exact-integer range, so floating division would corrupt low digits. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    apply(spark, sfDir, "events").withColumn("ts_us", expr("ts div 1000"))
  }
}
