package graft.ops

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q243's CUSUM rests on the prefix identity
  *   S_t = C_t − min(0, min_{i≤t} C_i),   C_t = Σ_{i≤t} x_t
  * replacing the sequential textbook recurrence S_t = max(0, S_{t−1}+x_t)
  * with two partitioned windows. The identity must hold exactly for any
  * sign pattern, and the detector must fire on a planted level shift at
  * (not before) the shift. */
class CusumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic mixed-sign series: long negative runs, spikes, zeros
  private val xs: Seq[Long] = (1 to 400).map { i =>
    ((i * 73 % 31) - 15 + (if (i % 50 == 0) 40 else 0)).toLong
  }

  test("prefix form equals the sequential recurrence exactly") {
    val seq = xs.scanLeft(0L)((s, x) => math.max(0L, s + x)).drop(1)
    val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }
      .toDF("t", "x")
    val w = Window.partitionBy(lit(1)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df.withColumn("cx", sum(col("x")).over(w))
      .withColumn("s", col("cx") - least(lit(0L), min(col("cx")).over(w)))
      .orderBy("t").select("s").as[Long].collect().toSeq
    assert(got == seq)
  }

  test("planted level shift fires the alarm at the shift, not before") {
    // 60-day series: counts ~100 (±3 deterministic wobble), then a
    // sustained +15 shift from day 40 — no single day is a 3-MAD
    // outlier (q242 stays silent by design), but the drawup compounds
    val counts = (0 until 60).map { d =>
      val base = 100L + (d % 7) - 3
      if (d >= 40) base + 15 else base
    }
    val c = counts.zipWithIndex.map { case (n, d) => (d.toLong, n) }
      .toDF("day", "c")
    val nd = counts.size.toLong
    val tot = counts.sum
    // integer MAD of the series (lower median of |c − median|)
    val sorted = counts.sorted
    val med = sorted((nd.toInt - 1) / 2)
    val devs = counts.map(v => math.abs(v - med)).sorted
    val mad = math.max(devs((nd.toInt - 1) / 2), 1L)
    assert(counts.zipWithIndex.forall { case (v, _) =>
      math.abs(v - med) <= 3 * mad * 3
    }, "fixture sanity: shift small enough to not be a point outlier")
    val w = Window.partitionBy(lit(1)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val alarms = c
      .withColumn("x", lit(nd) * col("c") - lit(tot))
      .withColumn("cx", sum(col("x")).over(w))
      .withColumn("s", col("cx") - least(lit(0L), min(col("cx")).over(w)))
      .filter(col("s") > lit(5L * mad * nd))
      .orderBy("day").select("day").as[Long].collect()
    assert(alarms.nonEmpty, "shift must be detected")
    assert(alarms.head >= 40L, s"alarm before the shift: ${alarms.head}")
    assert(alarms.head <= 50L, s"detection too slow: ${alarms.head}")
  }
}
