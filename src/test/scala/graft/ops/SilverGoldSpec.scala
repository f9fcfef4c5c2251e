package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SilverGoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def silver = Seq(
    (Some(1), Some("a"), Some(1), "2024-01-01 00:00:00"),
    (Some(1), Some("a"), Some(0), "2024-01-02 00:00:00"),
    (Some(2), Some("b"), Some(1), "2024-01-03 00:00:00"),
    (None, Some("c"), Some(0), "2024-01-04 00:00:00"))
    .toDF("user_id", "seg", "click", "evt")

  test("toGold: na.drop, raw copies, indexing, casts, timestamps") {
    val g = SilverGold.toGold(silver,
      keep = Seq("user_id", "seg", "click", "evt"),
      rawCopy = Seq("user_id"), index = Seq("user_id", "seg"),
      eventTime = "evt")
    val t = g.table
    assert(t.count() === 3) // null user_id row dropped
    assert(t.columns.contains("user_id_raw"))
    // user_id=1 most frequent -> index 0; raw copy untouched
    val r = t.filter(col("user_id_raw") === 1).select("user_id").distinct()
      .as[Int].head()
    assert(r === 0)
    assert(t.schema("user_id").dataType.typeName === "integer")
    assert(t.schema("datetime").dataType.typeName === "timestamp")
    // datetime derives from event time, not load time
    assert(t.filter(col("datetime") === to_timestamp(lit("2024-01-01 00:00:00")))
      .count() === 1)
  }

  test("retrievalSplit keeps only click==1") {
    val g = SilverGold.toGold(silver,
      keep = Seq("user_id", "seg", "click", "evt"),
      rawCopy = Nil, index = Seq("seg"), eventTime = "evt")
    assert(SilverGold.retrievalSplit(g.table).count() === 2)
  }
}
