package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import FeatureStore._

class FeatureStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val view = FeatureView("user_feats", Seq("uid"), "ts",
    ttlUs = 100L, features = Seq("score"))

  private def source = Seq(
    (1L, 10L, 0.5, "junk"), (1L, 30L, 0.9, "junk"),
    (2L, 20L, 0.1, "junk")).toDF("uid", "ts", "score", "extra")

  test("materializeOnline keeps newest row per key; lookup filters to requested keys") {
    val dir = java.nio.file.Files.createTempDirectory("fs").toString
    materializeOnline(view, source, s"$dir/online")
    val keys = Seq(1L).toDF("uid")
    val out = getOnlineFeatures(spark, s"$dir/online", view, keys)
      .select("uid", "ts", "score").as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 30L, 0.9)))
  }

  test("view projection drops non-feature columns") {
    assert(view.project(source).columns.toSeq === Seq("uid", "ts", "score"))
  }

  test("getHistoricalFeatures: as-of semantics with view TTL, inclusive ts") {
    val entities = Seq((1L, 30L), (1L, 200L), (2L, 15L))
      .toDF("uid", "ets")
    val out = getHistoricalFeatures(entities, view, source, "ets")
      .select("uid", "ets", "score").as[(Long, Long, Option[Double])]
      .collect().toSet
    assert(out === Set(
      (1L, 30L, Some(0.9)),   // ts=30 inclusive (strict=false)
      (1L, 200L, None),       // newest (ts=30) older than TTL=100 -> null
      (2L, 15L, None)))       // ts=20 in the future -> null
  }
}
