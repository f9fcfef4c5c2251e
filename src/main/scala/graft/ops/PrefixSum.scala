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

  /** Adds `rankCol` (1-based global ROW_NUMBER under (valueCol DESC,
    * tieCol ASC)) and `nCol` (total rows) — the distributed form of
    * `row_number() OVER (ORDER BY v DESC, k)`, whose bare-window plan
    * funnels the whole frame through one task. Same decomposition as
    * [[runningTotalDesc]] with per-bucket COUNTS as the ledger. Exact
    * for a strict total order ((valueCol, tieCol) unique per row). */
  def rankDesc(df: DataFrame, valueCol: String, tieCol: String,
               rankCol: String, nCol: String,
               buckets: Int = -1): DataFrame =
    decompose(df, valueCol, tieCol, buckets,
      _ => org.apache.spark.sql.functions.lit(1L),
      (local, off, tot) => Seq(
        (local + off).as(rankCol), tot.as(nCol)))

  /** Adds `tileCol`: global NTILE(k) under (valueCol DESC, tieCol ASC)
    * with engine-standard remainder semantics (the first N mod k tiles
    * take one extra row) — exact integer arithmetic over the
    * distributed rank, so it matches a single-window NTILE bit for bit
    * without the single-task sort. */
  def ntileDesc(df: DataFrame, valueCol: String, tieCol: String,
                tileCol: String, k: Int, buckets: Int = -1): DataFrame = {
    require(k >= 1, "ntile k must be >= 1")
    import org.apache.spark.sql.functions._
    // all-integer arithmetic (`div`, never `/` — Column./ is DOUBLE
    // division and would round past 2^53 rows); CaseWhen evaluates
    // lazily per row, so the size-0 branch never divides by zero when
    // n < k (every rank then lives in the size+1 tiles)
    rankDesc(df, valueCol, tieCol, "__rank", "__n", buckets)
      .withColumn("__size", expr(s"__n div $k"))
      .withColumn("__rem", col("__n") % k)
      .withColumn("__cut", col("__rem") * (col("__size") + 1))
      .withColumn(tileCol,
        when(col("__rank") <= col("__cut"),
          expr("(__rank - 1) div (__size + 1)") + 1)
          .otherwise(col("__rem") +
            expr("(__rank - 1 - __cut) div __size") + 1)
          .cast("int"))
      .drop("__rank", "__n", "__size", "__rem", "__cut")
  }

  /** Adds `cumCol` (inclusive running total of `valueCol` under
    * (valueCol DESC, tieCol ASC)) and `totCol` (grand total) to `df`.
    *
    * @param buckets parallelism knob; <= 0 uses the session's shuffle
    *                parallelism. Any value >= 1 yields identical output.
    */
  def runningTotalDesc(df: DataFrame, valueCol: String, tieCol: String,
                       cumCol: String, totCol: String,
                       buckets: Int = -1): DataFrame =
    decompose(df, valueCol, tieCol, buckets, identity,
      (local, off, tot) => Seq((local + off).as(cumCol), tot.as(totCol)))

  /** The shared decomposition: bucketize on a boundary sample of
    * `valueCol`, ledger = per-bucket sums of `weight(value)`, output =
    * `emit(bucket-local inclusive cumsum, broadcast offset, total)`. */
  private def decompose(df: DataFrame, valueCol: String, tieCol: String,
                        buckets: Int, weight: Column => Column,
                        emit: (Column, Column, Column) => Seq[Column])
      : DataFrame = {
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
      .agg(sum(weight(v)).as("__btot"))
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
    val outCols = emit(sum(weight(v)).over(wLocal), col("__off"),
      lit(total))
    bucketed
      .join(broadcast(ledgerDf), col("__rng") === col("__orng"))
      .select(col("*") +: outCols: _*)
      .drop("__rng", "__orng", "__off")
  }
}
