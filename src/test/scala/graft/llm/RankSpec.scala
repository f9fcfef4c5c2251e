package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark table scan fast table table"), // tf(table)=3, dl=6
    (2L, "hash join and hash aggregate"),
    (3L, "nothing relevant here at all"),
    (4L, "table"),
    (5L, "")).toDF("doc_id", "text")

  test("scores match a hand-computed BM25 (linear idf), zero-hit docs dropped") {
    val out = Rank.bm25(docs, "doc_id", "text", Seq("table"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    // N=5, df=2, avgdl=(6+5+5+1+0)/5=3.4, idf=(5-2+0.5)/(2+0.5)=1.4
    val k1 = 1.2; val b = 0.75; val avgdl = 17.0 / 5
    def score(tf: Double, dl: Double) =
      math.floor(1.4 * (tf * (k1 + 1)) /
        (tf + k1 * (1 - b + b * (dl / avgdl))) * 1e6 + 0.5) / 1e6
    assert(out.keySet === Set(1L, 4L))
    assert(out(1L) === score(3, 6))
    assert(out(4L) === score(1, 1))
  }

  test("linear idf preserves the textbook-BM25 ranking") {
    val linear = Rank.bm25(docs, "doc_id", "text", Seq("table", "hash"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    val textbook = Rank.bm25(docs, "doc_id", "text", Seq("table", "hash"),
        linearIdf = false)
      .orderBy(desc("bm25"), asc("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    assert(linear === textbook)
  }

  test("null-text docs neither score nor inflate the corpus statistics") {
    val withNull = docs.union(
      Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val a = Rank.bm25(docs, "doc_id", "text", Seq("table"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    val bN = Rank.bm25(withNull, "doc_id", "text", Seq("table"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(a === bN) // identical stats -> identical scores
  }

  test("the scoring pass is join-free: stats enter as literals") {
    val plan = Rank.bm25(docs, "doc_id", "text", Seq("table"))
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(!plan.contains("join"), s"expected no join in scoring plan:\n$plan")
  }
}
