package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running total over a GLOBAL total order — the Pareto /
  * cumulative-share shape (reference: ABC classification over per-part
  * revenue) — without the single-partition `WindowExec` that
  * `Window.orderBy(...)` with no `partitionBy` schedules: that plan moves
  * the whole frame to ONE task, a non-starter when the ordered frame is
  * catalog-sized (billions of parts at 100 TB).
  *
  * Same decomposition as [[graft.llm.Pack.packSequences]] (order-preserving
  * buckets → tiny offset ledger → bucket-local windows), adapted to an
  * ORDER BY over a value column rather than an id span:
  *
  *  1. boundary sample: `approx_percentile(value, (1..n-1)/n)` — one
  *     column-pruned aggregate; boundaries become PLAN LITERALS, so bucket
  *     assignment is a pure row function and the two passes below cannot
  *     disagree (a `spark_partition_id()` ledger would tie correctness to
  *     cross-job partition-layout determinism — rejected for exactly that
  *     reason).
  *  2. bucket = #{boundary b : value < b} with boundaries sorted
  *     descending — order-preserving for (value DESC, tie ASC): every row
  *     of bucket r sorts before every row of bucket r+1; value ties always
  *     share a bucket, the tie column only orders WITHIN one.
  *  3. offset ledger: per-bucket sums (≤ buckets rows) collected to the
  *     driver, prefix-summed in Scala, re-entered as a broadcast local
  *     relation — no window at all on the tiny frame, so the executed plan
  *     carries ZERO unpartitioned `WindowExec` (the audit greps for it).
  *  4. bucket-local inclusive cumsum (`Window.partitionBy(bucket)`) plus
  *     the broadcast offset; the global total rides along as a literal.
  *
  * Output is bucket-invariant: offsets + local sums reconstruct the exact
  * global running total for ANY boundary placement, so the approximate
  * quantiles only steer parallelism, never values (PrefixSumSpec asserts
  * equality with the single-window formulation across bucket counts).
  *
  * Preconditions: `valueCol` non-null (aggregate outputs upstream);
  * (valueCol, tieCol) unique per row for a deterministic result (the usual
  * order-by-non-unique-key window caveat). Cost: three column-pruned passes
  * over `df` (boundaries / ledger / output) instead of one single-task
  * sort — the packSequences trade, see its Scaladoc.
  */
object PrefixSum {

  /** Adds `cumCol` (inclusive running total of `valueCol` under
    * (valueCol DESC, tieCol ASC)) and `totCol` (grand total) to `df`.
    *
    * @param buckets parallelism knob; <= 0 uses the session's shuffle
    *                parallelism. Any value >= 1 yields identical output.
    */
  def runningTotalDesc(df: DataFrame, valueCol: String, tieCol: String,
                       cumCol: String, totCol: String,
                       buckets: Int = -1): DataFrame = {
    val spark = df.sparkSession
    val nB =
      if (buckets > 0) buckets
      else math.max(
        spark.conf.get("spark.sql.shuffle.partitions", "32").toInt, 1)
    val v = col(valueCol)

    // 1. boundary sample — one tiny driver row; distinct+desc so bucket
    // ranges are strictly decreasing even on heavily tied values.
    val probs = (1 until nB).map(i => i.toDouble / nB)
    val boundaries: Seq[Long] =
      if (nB == 1) Seq.empty
      else df.select(percentile_approx(v.cast("double"),
          typedLit(probs), lit(10000)).as("qs"))
        .collect()(0).getSeq[Double](0) match {
          case null => Seq.empty // empty input
          case qs => qs.map(q => math.floor(q).toLong).distinct
            .sorted(Ordering.Long.reverse)
        }

    // 2. order-preserving bucket id as a pure literal expression.
    val rng = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(v < lit(b), 1).otherwise(0)
    }
    val bucketed = df.withColumn("__rng", rng)

    // 3. per-bucket totals → driver prefix sum → broadcast ledger.
    val perBucket = bucketed.groupBy(col("__rng"))
      .agg(sum(v).as("__btot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = perBucket.map(_._2).sum
    val ledger = perBucket
      .scanLeft((0, 0L, 0L)) { case ((_, off, tot), (b, s)) =>
        (b, off + tot, s) // offset = sum of all preceding buckets
      }.drop(1).map { case (b, off, _) => Row(b, off) }
    import scala.jdk.CollectionConverters._
    val ledgerDf = spark.createDataFrame(
      ledger.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__orng",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false))))

    // 4. bucket-local inclusive cumsum + broadcast offset.
    val wLocal = Window.partitionBy(col("__rng"))
      .orderBy(v.desc, col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(ledgerDf), col("__rng") === col("__orng"))
      .withColumn(cumCol, col("__off") + sum(v).over(wLocal))
      .withColumn(totCol, lit(total))
      .drop("__rng", "__orng", "__off")
  }
}
