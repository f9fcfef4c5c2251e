package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("alpha=1 is proportional sampling: one uniform rate") {
    val r = Mix.temperatureRates(
      Map(Option("a") -> 800L, Option("b") -> 200L), alpha = 1.0,
      targetRows = 500L)
    assert(math.abs(r(Some("a")) - 0.5) < 1e-12)
    assert(math.abs(r(Some("b")) - 0.5) < 1e-12)
  }

  test("alpha=0 targets equal counts per source, capping small sources") {
    // target 600 over sources of 1000 and 100: equal split wants 300
    // each, but b has only 100 -> b caps at 1.0 and a absorbs 500
    val r = Mix.temperatureRates(
      Map(Option("a") -> 1000L, Option("b") -> 100L), alpha = 0.0,
      targetRows = 600L)
    assert(r(Some("b")) === 1.0)
    assert(math.abs(r(Some("a")) - 0.5) < 1e-12)
  }

  test("alpha=0.5 upweights the rare source; expected mass hits target") {
    val counts = Map(Option("a") -> 900L, Option("b") -> 100L)
    val r = Mix.temperatureRates(counts, alpha = 0.5, targetRows = 400L)
    // sampled ∝ sqrt(n): a gets 300, b gets 100... sqrt(900)=30,
    // sqrt(100)=10 -> C=10 -> a: 300/900, b: 100/100 (caps exactly at 1)
    assert(math.abs(r(Some("a")) - 300.0 / 900) < 1e-12)
    assert(r(Some("b")) === 1.0)
    val expected = counts.map { case (s, n) => r(s) * n }.sum
    assert(math.abs(expected - 400.0) < 1e-9)
  }

  test("null source forms its own group") {
    val r = Mix.temperatureRates(
      Map(Option("a") -> 100L, None -> 100L), 1.0, 100L)
    assert(r(None) === 0.5)
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "source")
    // ratess chosen so only the null row can survive
    val kept = Mix.sample(df, "doc_id", "source",
        Map(Option("a") -> 0.0, None -> 1.0))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L))
  }

  test("ppsSample: ~k rows, weight-proportional, deterministic, exact") {
    val docs = spark.range(5000).select(col("id").as("doc_id"),
      (col("id") % 97 + 1).as("w"))
    val k = 100
    val out = Mix.ppsSample(docs, "doc_id", "w", k)
      .select("doc_id").as[Long].collect().sorted
    // ≤ k, and within straddle slack of k
    assert(out.length <= k && out.length >= k - 10, s"got ${out.length}")
    // deterministic under a different partitioning
    val out2 = Mix.ppsSample(docs.repartition(17), "doc_id", "w", k)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === out2.toSeq)
    // weight-proportionality: the selected mass per weight bucket tracks
    // the bucket's share of total mass (heavy bucket picked ~3x a light
    // bucket a third its weight)
    val w = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val heavy = out.count(id => w(id) > 64).toDouble
    val light = out.count(id => w(id) <= 32).toDouble
    assert(heavy > light, "heavier rows must be likelier")
    // a scalar replay of the same integer selection agrees exactly
    def md5signed(s: String): Long = {
      // Md5Hash.lower64's byte order: bytes 15 down to 8
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var out = 0L
      var i = 15
      while (i >= 8) { out = (out << 8) | (d(i) & 0xffL); i -= 1 }
      out
    }
    val ordered = w.keys.toSeq.sortBy(id => (md5signed(id.toString), id))
    val total = w.values.sum
    var cum = 0L
    val expect = ordered.flatMap { id =>
      val before = cum; cum += w(id)
      if (before * k / total < cum * k / total) Some(id) else None
    }.sorted
    assert(out.toSeq === expect)
  }

  test("ppsSample: null/non-positive weights and null ids drop") {
    val docs = Seq(
      (Some(1L), Some(10L)), (Some(2L), Some(0L)), (Some(3L), None),
      (None, Some(5L)), (Some(4L), Some(-3L)), (Some(5L), Some(20L)))
      .toDF("doc_id", "w")
    val out = Mix.ppsSample(docs, "doc_id", "w", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 5L)) // k >= rows: every eligible row selected
  }

  test("sampling is deterministic and lands near the expected mass") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val counts = docs.groupBy("source").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val rates = Mix.temperatureRates(counts, 0.5, total / 2)
    val a = Mix.sample(docs, "doc_id", "source", rates)
      .select("doc_id").as[Long].collect().toSet
    val b = Mix.sample(docs, "doc_id", "source", rates)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b, "hash sampling must be repeatable")
    val expected = counts.map { case (s, n) => rates(s) * n }.sum
    assert(math.abs(a.size - expected) / expected < 0.15,
      s"kept ${a.size}, expected ~$expected")
  }
}
