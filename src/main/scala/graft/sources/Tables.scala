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

  /** events with `ts_us` (epoch micros, BIGINT) derived from the nano ts.
    * Integer `div`, not `/`: epoch-nanos (~1.7e18) exceed double's 2^53
    * exact-integer range, so floating division would corrupt low digits. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    apply(spark, sfDir, "events").withColumn("ts_us", expr("ts div 1000"))
  }
}
