package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Numeric feature scaling — the numeric sibling of [[Categorify]]'s
  * StringIndexer surface (the reference fits only categorical indexers,
  * batch_process_Silver_to_Gold.py:106-117; a feature store that serves
  * models needs the SAME fit-once/transform-everywhere contract for
  * numeric columns, or training-serving skew appears the first time the
  * online path normalizes with a different epoch's statistics).
  *
  * Fit is ONE aggregate pass over all columns producing a driver-sized
  * stats row (4 numbers per column — the [[graft.llm.IvfIndex]]
  * centroid-literal discipline); transform is a pure projection with the
  * statistics inlined as plan literals — no join, no shuffle, scan-bound
  * at any scale.
  *
  * Engine-exactness: sums ride exact decimals (inputs rounded to 6
  * decimals, squares computed IN DECIMAL so they stay exact at scale 12;
  * integer/decimal adds are order-insensitive, unlike double sums),
  * and the derived mean/std/min/max reach the transform as IEEE doubles
  * through the same operation sequence an external oracle can replay
  * (decimal→double cast, double divide, sqrt — all correctly rounded).
  * NULL inputs are excluded from the statistics and transform to NULL.
  */
object Scaler {

  /** Per-column fitted statistics. */
  final case class ColStats(min: Double, max: Double, mean: Double,
                            std: Double, n: Long)

  final case class Model(stats: Map[String, ColStats]) {
    /** Z-score projection for `c`: (x − mean)/std, 6-decimal floor
      * rounding; NULL std-0 columns scale to 0. */
    def zscore(c: String): Column = {
      val s = stats(c)
      if (s.std == 0.0) when(col(c).isNotNull, lit(0.0))
      else floor((col(c) - s.mean) / s.std * 1e6 + 0.5) / 1e6
    }

    /** Min-max projection for `c` into [0,1]; degenerate range maps
      * to 0. */
    def minmax(c: String): Column = {
      val s = stats(c)
      if (s.max == s.min) when(col(c).isNotNull, lit(0.0))
      else floor((col(c) - s.min) / (s.max - s.min) * 1e6 + 0.5) / 1e6
    }

    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      stats.toSeq.map { case (c, s) => (c, s.min, s.max, s.mean, s.std, s.n) }
        .toDF("col", "min", "max", "mean", "std", "n")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
  }

  def load(spark: SparkSession, path: String): Model =
    Model(spark.read.parquet(path).collect().map { r =>
      r.getString(0) -> ColStats(r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))
    }.toMap)

  private def dec6(c: Column): Column =
    (floor(c * 1e6 + 0.5) / 1e6).cast("decimal(18,6)")

  /** One aggregate pass over every column; statistics land on the
    * driver as plan literals for [[Model.zscore]]/[[Model.minmax]]. */
  def fit(df: DataFrame, cols: Seq[String]): Model = {
    require(cols.nonEmpty, "scaler needs at least one column")
    val aggs = cols.flatMap { c =>
      val d = dec6(col(c))
      // min/max cast to double IN the aggregate: min()/max() preserve the
      // input type, so an integer/long/decimal column would otherwise make
      // the driver-side getAs[Double] throw ClassCastException
      Seq(min(col(c).cast("double")).as(s"__min_$c"),
        max(col(c).cast("double")).as(s"__max_$c"),
        sum(d).as(s"__sum_$c"),
        // square in DOUBLE (one IEEE multiply — identical in any
        // engine), then round to decimal so the SUM is exact and
        // order-insensitive; decimal×decimal would be exact too but
        // overflows DuckDB's 18-digit multiply on price-scale values
        sum(dec6(col(c) * col(c))).as(s"__sq_$c"),
        count(col(c)).as(s"__n_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    Model(cols.map { c =>
      val n = row.getAs[Long](s"__n_$c")
      if (n == 0) c -> ColStats(0.0, 0.0, 0.0, 0.0, 0L)
      else {
        val sumD = row.getAs[java.math.BigDecimal](s"__sum_$c")
          .doubleValue()
        val sqD = row.getAs[java.math.BigDecimal](s"__sq_$c").doubleValue()
        val mean = sumD / n
        val variance = (sqD - sumD * sumD / n) / n
        val std = math.sqrt(math.max(variance, 0.0))
        c -> ColStats(row.getAs[Double](s"__min_$c"),
          row.getAs[Double](s"__max_$c"), mean, std, n)
      }
    }.toMap)
  }
}
