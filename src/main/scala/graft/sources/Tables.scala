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

  /** File-STREAM source for a fixture table, layout-branched (the q250
    * lesson): a fixture table is a single FILE — streamable only as the
    * sf dir plus a glob filter — while a scaling replica is a DIRECTORY
    * of part files, where that dir-level glob matches NOTHING and the
    * stream silently reads zero rows. Every streaming query sources
    * through here so the branch lives in exactly one place. The schema
    * comes from a batch read of the same table (file-source streams
    * require an explicit schema). */
  def stream(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val reader = spark.readStream.schema(apply(spark, sfDir, name).schema)
    // Hadoop FS, not java.io.File: the branch must also hold on
    // HDFS/object-store URIs, where a local-FS stat answers false for
    // everything and would silently route a directory table into the
    // nothing-matching glob
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val isDir =
      try fs.getFileStatus(hp).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    if (isDir) reader.parquet(path)
    else reader.option("pathGlobFilter", s"$name.parquet").parquet(sfDir)
  }

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

  /** Epoch-micros BIGINT for an event-time column, whatever precision the
    * fixture generation chose — the generator has shipped both:
    *  - nanosecond parquet surfaces as epoch-nano BIGINT (nanosAsLong;
    *    Spark has no TIMESTAMP(NANOS)) -> integer `div 1000`. Integer
    *    `div`, not `/`: epoch-nanos (~1.7e18) exceed double's 2^53
    *    exact-integer range, so floating division would corrupt low digits.
    *  - micro/milli parquet surfaces as TIMESTAMP or TIMESTAMP_NTZ ->
    *    `unix_micros` after a cast to TIMESTAMP. The session time zone is
    *    pinned UTC ([[graft.GraftSession.tune]]), so the NTZ->TZ cast
    *    preserves the file's raw int64 — and DuckDB's `epoch_us(ts)` on
    *    the naive timestamp reads the identical number, keeping every
    *    event-time oracle exact under either file layout.
    */
  def tsUsOf(schema: org.apache.spark.sql.types.StructType,
             tsCol: String = "ts"): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    schema(tsCol).dataType match {
      case LongType => expr(s"$tsCol div 1000")
      case _        => unix_micros(col(tsCol).cast(TimestampType))
    }
  }

  /** events with `ts_us` (epoch micros, BIGINT) derived via [[tsUsOf]]. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val e = apply(spark, sfDir, "events")
    e.withColumn("ts_us", tsUsOf(e.schema))
  }
}
