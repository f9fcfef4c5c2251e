package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Scan/sink surface (SURVEY.md §2.1).
  *
  * Reads take an explicit schema wherever the reference inferred one — an
  * inference pass is a second full scan of the input at 100 TB
  * (reference: headerless CSV with auto `_cN` names,
  * batch_process_Bronze_to_Silver.py:89,176).
  */
object Sources {

  /** Headerless CSV scan (S1). Explicit schema — no inference job. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          delimiter: String = ","): DataFrame =
    spark.read.option("delimiter", delimiter).schema(schema).csv(path)

  /** Parquet sink with bounded file sizes (S3/R2). The reference ran
    * count() then repartition(count/rows_per_file) — executing the whole
    * pipeline TWICE (SURVEY.md §4.2 pathology #3). maxRecordsPerFile gets
    * the same file sizing in a single pass with no extra job. */
  def writeParquet(df: DataFrame, path: String, rowsPerFile: Long = 100000,
                   mode: String = "overwrite",
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode).option("maxRecordsPerFile", rowsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** JDBC sink (S4) — the reference's Gold Postgres write
    * (batch_process_Silver_to_Gold.py:166-172). numPartitions bounds the
    * connection count; no DB in this container, so exercised only on a
    * cluster. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                user: String, password: String,
                numPartitions: Int = 8, mode: String = "overwrite"): Unit = {
    val props = new java.util.Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    df.coalesce(numPartitions).write.mode(mode).jdbc(url, table, props)
  }

  /** Bucketed managed table: pre-shuffles once at write time so every
    * subsequent equi-join/aggregation on the bucket key is co-located —
    * zero Exchange in the join plan (asserted in SourcesSpec). At 100 TB
    * this converts the recurring silver⋈gold / fact⋈fact shuffles into a
    * one-time layout cost. Requires a table catalog (saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, bucketKey: String,
                    buckets: Int, sortBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // A fresh metastore can meet a stale warehouse dir left by an earlier
    // session (LOCATION_ALREADY_EXISTS): drop the entry AND the orphaned
    // location so overwrite is idempotent across sessions.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketKey)
    (if (sortBy.nonEmpty) w.sortBy(sortBy.head, sortBy.tail: _*) else w)
      .saveAsTable(table)
  }

  /** ORC scan — the other columnar format Spark ships natively (no
    * extra jar). Same posture as [[csv]]: pass the schema when known
    * and skip the inference scan; ORC predicate pushdown and column
    * pruning work exactly like parquet's (SourcesSpec asserts the
    * pushed filters reach the scan). */
  def orc(spark: SparkSession, path: String,
          schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).orc(path)
  }

  /** ORC sink with bounded file sizes — [[writeParquet]]'s twin for
    * pipelines whose downstream consumers (Hive/Trino/legacy warehouses)
    * are ORC-first; one pass, no count()+repartition re-execution. */
  def writeOrc(df: DataFrame, path: String, rowsPerFile: Long = 100000,
               mode: String = "overwrite",
               partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode).option("maxRecordsPerFile", rowsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .orc(path)
  }

  /** Single-file CSV sample sink (S5/R3/R4) — the reference's 10k-row
    * fixture dump (generate_example_data.py:71-72). */
  def writeCsvSample(df: DataFrame, path: String, n: Int): Unit =
    df.limit(n).coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
}
