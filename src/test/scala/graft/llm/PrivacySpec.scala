package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    ("en", 21), ("en", 22), ("en", 23), ("en", 24),
    ("de", 21), ("de", 25), ("de", 31), ("fr", 45)).toDF("lang", "age")

  private def ladder = Seq(
    Seq(col("lang").as("q1"), col("age").cast("string").as("q2")),
    Seq(col("lang").as("q1"),
      (floor(col("age") / 10) * 10).cast("int").cast("string").as("q2")),
    Seq(col("lang").as("q1"), lit("*").as("q2")))

  test("picks the first level where every group reaches k") {
    // k=2: raw ages are all singletons; decade buckets give
    // en/20s=4, de/20s=2, de/30s=1 -> still <2 ... fr/40s=1 -> level 2
    val (lvl2, g2) = Privacy.kAnonymize(df, ladder, k = 2)
    assert(lvl2 === 2)
    assert(g2.filter(col("suppressed")).count() === 1) // fr alone
    // k=1: every group qualifies at the finest level
    val (lvl0, _) = Privacy.kAnonymize(df, ladder, k = 1)
    assert(lvl0 === 0)
  }

  test("residual small groups at the coarsest level are suppressed") {
    val (lvl, g) = Privacy.kAnonymize(df, ladder, k = 4)
    assert(lvl === 2)
    val rows = g.orderBy("q1").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(4))).toSeq
    assert(rows === Seq(("de", 3L, true), ("en", 4L, false),
      ("fr", 1L, true)))
  }

  test("NULL quasi values form a group like any other") {
    val withNull = Seq((Some("en"), 1), (None, 2), (None, 3))
      .toDF("lang", "age")
    val (lvl, g) = Privacy.kAnonymize(withNull,
      Seq(Seq(col("lang").as("q1"))), k = 2)
    assert(lvl === 0)
    val byLang = g.collect()
      .map(r => Option(r.getString(0)) -> r.getBoolean(3)).toMap
    assert(byLang === Map(Some("en") -> true, None -> false))
  }
}
