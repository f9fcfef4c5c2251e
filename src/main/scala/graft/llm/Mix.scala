package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-weighted temperature mixing — the training-mix operator: sample
  * a corpus so per-source representation follows n_s^alpha instead of raw
  * counts (alpha < 1 upweights rare sources, the standard multilingual /
  * multi-domain mixing rule; alpha = 1 is proportional, alpha = 0 equal
  * counts per source).
  *
  *  - [[temperatureRates]]: per-source keep probabilities from the
  *    (tiny, driver-sized) source histogram, solved by waterfilling:
  *    sampled_s = C * n_s^alpha capped at n_s (a source cannot yield more
  *    than it has), the excess mass redistributed to uncapped sources
  *    until the target row count is met. Deterministic.
  *  - [[sample]]: deterministic per-row coin from the md5-derived uniform
  *    (q66's kernel — externally recomputable, unlike `rand()`), kept
  *    when u < rate(source). A pure filter projection: no shuffle, no
  *    state, repeatable across runs and engines.
  *
  * The rates are data-dependent driver literals; q80's oracle inlines the
  * exact rates the run computed (the q39-centroid / q76-merges record
  * mechanism) and replays the same u < rate filter in SQL.
  */
object Mix {

  /** Waterfilling solve: keep-probability per source (None = NULL
    * source, its own group). alpha in [0,1]; targetRows is the desired
    * expected sample size. Sources with C*n^alpha >= n keep everything
    * (rate 1.0) and their mass moves to the rest. */
  def temperatureRates(counts: Map[Option[String], Long], alpha: Double,
                       targetRows: Long): Map[Option[String], Double] = {
    require(alpha >= 0 && alpha <= 1, s"alpha $alpha outside [0,1]")
    val total = counts.values.sum
    require(targetRows <= total,
      s"targetRows $targetRows exceeds corpus size $total")
    var capped = Set.empty[Option[String]]
    var rates = Map.empty[Option[String], Double]
    var done = false
    while (!done) {
      val remaining = targetRows - capped.toSeq.map(counts).sum
      val mass = counts.collect { case (s, n) if !capped(s) =>
        math.pow(n.toDouble, alpha) }.sum
      val c = if (mass == 0) 0.0 else remaining / mass
      val newlyCapped = counts.collect { case (s, n) if !capped(s) &&
        c * math.pow(n.toDouble, alpha) >= n => s }.toSet
      if (newlyCapped.isEmpty) {
        rates = counts.map { case (s, n) =>
          s -> (if (capped(s)) 1.0
                else c * math.pow(n.toDouble, alpha) / n)
        }
        done = true
      } else capped ++= newlyCapped
    }
    rates
  }

  /** The q66 uniform: top-31 bits of md5_lower64 of the id, as a double
    * in [0, 1) — deterministic and SQL-recomputable. */
  def uniform(id: Column): Column =
    shiftrightunsigned(
      call_function("md5_lower64", id.cast("string")), 33)
      .cast("double") / 2147483648.0

  /** Keep rows where uniform(id) < rate(source); null-safe on source. */
  def sample(docs: DataFrame, id: String, sourceCol: String,
             rates: Map[Option[String], Double]): DataFrame = {
    val rate = rates.foldLeft(lit(0.0)) {
      case (acc, (Some(src), r)) =>
        when(col(sourceCol) === src, r).otherwise(acc)
      case (acc, (None, r)) =>
        when(col(sourceCol).isNull, r).otherwise(acc)
    }
    docs.filter(uniform(col(id)) < rate)
  }

  /** Probability-proportional-to-size SYSTEMATIC sample of ~k rows,
    * weighted by an integer column (token/char counts — the weight a
    * training-data mixer actually balances on: a 10k-token doc is 10×
    * likelier than a 1k-token one, so the sampled TOKEN mass is
    * near-uniform across strata). Deterministic by construction: rows
    * order by (content-hash, id) — the q66 hash as the shuffle, never
    * `rand()` — a cumulative weight sum assigns each row the integer
    * interval [cum−w, cum), and a row is selected iff its interval
    * contains a stride boundary, tested EXACTLY as
    * floor((cum−w)·k/total) < floor(cum·k/total) in pure LONG
    * arithmetic (long division IS floor on non-negatives; requires
    * total·k < 2⁶³ — at 10¹⁴ total tokens and k = 10³ there is
    * headroom ×90). No floats anywhere, so an external oracle replays
    * the selection bit-for-bit. Rows heavier than total/k are selected
    * once, never duplicated, so the sample is ≤ k rows (= k when no
    * row straddles two boundaries). NULL ids and NULL/non-positive
    * weights drop (no meaningful inclusion probability).
    *
    * Scale shape: a partition-less running-sum window would serialize
    * the corpus through one task, so the cumsum rides the two-pass
    * shape instead (the Categorify ranking discipline): range-
    * repartition by the order key, per-partition running sums, then a
    * broadcast ≤#partitions-row offset table added back. */
  def ppsSample(docs: DataFrame, id: String, weightCol: String,
                k: Int): DataFrame = {
    require(k >= 1)
    val w = col(weightCol).cast("long")
    val base = docs.filter(col(id).isNotNull && w.isNotNull && w > 0)
      .withColumn("__h",
        call_function("md5_lower64", col(id).cast("string")))
    val sorted = base.repartitionByRange(col("__h"), col(id))
      .sortWithinPartitions(col("__h"), col(id))
    val withPart = sorted.withColumn("__p", spark_partition_id())
    val wp = withPart.withColumn("__local",
      sum(w).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("__p")).orderBy(col("__h"), col(id))))
    // per-partition totals: ≤ #partitions rows — the benign
    // partition-less window of the Categorify offset table
    val offs = wp.groupBy(col("__p")).agg(max(col("__local")).as("__pt"))
      .withColumn("__off",
        coalesce(sum(col("__pt")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("__p"))
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("__p"), col("__off"))
    val total = base.agg(sum(w).as("__total"))
    wp.join(broadcast(offs), Seq("__p"))
      .withColumn("__w", w)
      .withColumn("__cum", col("__local") + col("__off"))
      .crossJoin(broadcast(total))
      // `div` (not `/`): SQL long division floors; `/` would be double
      .filter(expr(s"(__cum - __w) * $k div __total < __cum * $k div __total"))
      .drop("__h", "__p", "__w", "__local", "__off", "__cum", "__total")
  }
}
