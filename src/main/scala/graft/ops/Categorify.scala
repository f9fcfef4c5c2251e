package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-based categorical indexing — the reference's 16-column
  * `StringIndexer` `Pipeline` (/root/reference/data_processing/
  * batch_processing/batch_process_Silver_to_Gold.py:106-126) rebuilt as a
  * relational operator.
  *
  * Semantics match MLlib `StringIndexer(frequencyDesc, handleInvalid=keep)`:
  * index 0 = most frequent value, ties broken by value ascending, unseen
  * values at transform time -> `numLabels`.
  *
  * Scale design: the reference fits 16 indexers *serially* — 16 full scans
  * (SURVEY.md §4.2 pathology #5). Here one `fit` melts all requested columns
  * into (column, value) pairs and computes every vocabulary in a single
  * scan + single shuffle. The fitted model is a small per-column lookup
  * table; `transform` broadcast-joins it, so at 100 TB the transform adds no
  * shuffle to the main table at all.
  */
object Categorify {

  /** One fitted vocabulary: column name -> lookup DataFrame
    * (`value: string, idx: long`) plus its size (the unseen index). */
  case class Model(lookups: Map[String, DataFrame], sizes: Map[String, Long]) {

    /** Replace each fitted column with its index (original value columns are
      * overwritten, like the reference's rename dance at
      * batch_process_Silver_to_Gold.py:126-130). Unseen -> vocab size. */
    def transform(df: DataFrame): DataFrame =
      lookups.foldLeft(df) { case (acc, (c, lut)) =>
        val l = broadcast(lut
          .withColumnRenamed("value", s"__${c}_val")
          .withColumnRenamed("idx", s"__${c}_idx"))
        acc
          .join(l, acc(c).cast("string") === l(s"__${c}_val"), "left")
          .withColumn(c, coalesce(col(s"__${c}_idx"), lit(sizes(c))))
          .drop(s"__${c}_val", s"__${c}_idx")
      }

    def save(path: String): Unit =
      lookups.foreach { case (c, lut) =>
        lut.coalesce(1).write.mode("overwrite").parquet(s"$path/$c")
      }
  }

  /** Single-pass multi-column frequency fit. */
  def fit(df: DataFrame, cols: Seq[String]): Model = {
    // Melt: one (col, value) row per cell, then a single groupBy computes all
    // vocabularies together. Nulls are excluded (StringIndexer drops them).
    val pairs = df.select(
      explode(map_from_arrays(
        array(cols.map(lit): _*),
        array(cols.map(c => col(c).cast("string")): _*))).as(Seq("c", "value")))
      .filter(col("value").isNotNull)
    val freq = pairs.groupBy("c", "value").count()
    val w = Window.partitionBy("c").orderBy(desc("count"), asc("value"))
    val indexed = freq
      .withColumn("idx", row_number().over(w).cast("long") - 1)
      .select("c", "value", "idx")
      .cache()
    val lookups = cols.map(c =>
      c -> indexed.filter(col("c") === c).select("value", "idx")).toMap
    val sizes = indexed.groupBy("c").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Model(lookups, cols.map(c => c -> sizes.getOrElse(c, 0L)).toMap)
  }

  def load(spark: SparkSession, path: String, cols: Seq[String]): Model = {
    val lookups = cols.map(c => c -> spark.read.parquet(s"$path/$c")).toMap
    val sizes = cols.map(c => c -> lookups(c).count()).toMap
    Model(lookups, sizes)
  }

  /** Pure-column variant for a single column when the vocabulary must stay
    * in-plan (used by oracle-checked queries): returns (df with idx column).
    * Same semantics as fit+transform but expressed as one windowed join. */
  def indexColumn(df: DataFrame, c: String, as: String): DataFrame = {
    val freq = df.filter(col(c).isNotNull)
      .groupBy(col(c).cast("string").as("__v")).count()
    val w = Window.orderBy(desc("count"), asc("__v"))
    val lut = freq.withColumn(as, row_number().over(w).cast("long") - 1)
      .select("__v", as)
    df.join(broadcast(lut), df(c).cast("string") === lut("__v"), "left")
      .drop("__v")
  }
}
