package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The grid-form AUC/Gini/KS must equal the brute-force pair/threshold
  * definitions exactly, and hit the known closed forms on planted
  * separable / reversed / constant scorers (non-vacuity: a broken grid
  * would still produce *some* number — the closed forms and the exact
  * pair count pin the right one). */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Brute-force reference: U over all pos×neg pairs with half-credit
    * ties; KS as the max CDF gap over distinct-score thresholds. */
  private def reference(rows: Seq[(Long, Long)]): (Double, Double, Double) = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    val auc = round6(u2.toDouble / (2.0 * pos.size * neg.size))
    val ks = rows.map(_._1).distinct.map { t =>
      val fp = pos.count(_ <= t).toDouble / pos.size
      val fn = neg.count(_ <= t).toDouble / neg.size
      math.abs(fp - fn)
    }.max
    (auc, round6(auc * 2 - 1), round6(ks))
  }

  private def metrics(rows: Seq[(Long, Long)]): (Double, Double, Double) = {
    val out = Eval.rankingMetrics(
      rows.toDF("score", "y"), "score", "y", Seq.empty).collect()
    assert(out.length == 1)
    val r = out.head
    (r.getAs[Double]("auc"), r.getAs[Double]("gini"), r.getAs[Double]("ks"))
  }

  test("perfectly separable scorer: auc=1, gini=1, ks=1") {
    val rows = (1 to 40).map(i => (i.toLong + 100, 1L)) ++
      (1 to 60).map(i => (i.toLong, 0L))
    assert(metrics(rows) == ((1.0, 1.0, 1.0)))
  }

  test("perfectly reversed scorer: auc=0, gini=-1, ks=1") {
    val rows = (1 to 40).map(i => (i.toLong, 1L)) ++
      (1 to 60).map(i => (i.toLong + 100, 0L))
    assert(metrics(rows) == ((0.0, -1.0, 1.0)))
  }

  test("constant scorer: all-tie half credit gives auc=0.5, ks=0") {
    val rows = (1 to 30).map(_ => (7L, 1L)) ++ (1 to 50).map(_ => (7L, 0L))
    assert(metrics(rows) == ((0.5, 0.0, 0.0)))
  }

  test("matches the brute-force pair count on a tied, interleaved fixture") {
    val rows = (1 to 300).map { i =>
      val score = (i * 53 % 17).toLong // heavy ties across both classes
      val y = if ((i * 31 % 7) < 3) 1L else 0L
      (score, y)
    }
    assert(metrics(rows) == reference(rows))
  }

  test("grouped: each group scored independently, degenerate groups dropped") {
    val g0 = (1 to 120).map(i => (0L, (i * 29 % 23).toLong, (i % 3 == 0)))
    val g1 = (1 to 90).map(i => (1L, (i * 41 % 11).toLong, (i % 4 == 0)))
    val gAllPos = (1 to 10).map(i => (2L, i.toLong, true)) // no negatives
    val rows = (g0 ++ g1 ++ gAllPos)
      .map { case (g, s, y) => (g, s, if (y) 1L else 0L) }
    val out = Eval.rankingMetrics(
      rows.toDF("g", "score", "y"), "score", "y", Seq("g"))
      .collect().map(r => r.getAs[Long]("g") ->
        (r.getAs[Double]("auc"), r.getAs[Double]("gini"),
          r.getAs[Double]("ks"))).toMap
    assert(out.keySet == Set(0L, 1L), "degenerate group must be dropped")
    for (g <- Seq(0L, 1L)) {
      val ref = reference(rows.filter(_._1 == g).map(t => (t._2, t._3)))
      assert(out(g) == ref, s"group $g diverged from brute force")
    }
  }
}
