package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SCD2 build: run collapse, validity chaining, NULL handling, and the
  * single-Exchange plan contract. */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def build(rows: Seq[(java.lang.Long, java.lang.Long, Long, String)]) =
    Scd.scd2(rows.toDF("k", "ts", "tie", "attr"), "k", "ts", "tie",
      Seq("attr"))

  test("collapses no-op runs, chains validity, flags the open row") {
    val out = build(Seq(
      (1L: java.lang.Long, 10L: java.lang.Long, 1L, "a"),
      (1L, 20L, 2L, "a"), // no-op -> collapsed
      (1L, 30L, 3L, "b"),
      (1L, 40L, 4L, "a"), // back to a IS a new version
      (2L, 10L, 5L, "x")))
      .select($"k", $"version", $"attr", $"valid_from", $"valid_to",
        $"is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5))).toSet
    assert(out === Set(
      (1L, 1L, "a", 10L, 30L, false),
      (1L, 2L, "b", 30L, 40L, false),
      (1L, 3L, "a", 40L, -1L, true),
      (2L, 1L, "x", 10L, -1L, true)))
  }

  test("NULL attribute values are versions; NULL key/ts rows drop") {
    val out = build(Seq(
      (1L: java.lang.Long, 10L: java.lang.Long, 1L, "a"),
      (1L, 20L, 2L, null), // a -> NULL is a change
      (1L, 30L, 3L, null), // NULL -> NULL is a no-op (NULL-safe)
      (1L, 40L, 4L, "a"),
      (null, 50L, 5L, "z"), // NULL key drops
      (2L, null, 6L, "z"))) // NULL ts drops
      .select($"k", $"version", $"attr")
      .collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L))
    val v = out.sortBy(r => r.getLong(1))
      .map(r => Option(r.getString(2)).getOrElse("<null>"))
    assert(v.toSeq === Seq("a", "<null>", "a"))
  }

  test("same-timestamp changes resolve by the tie-break, not arrival") {
    val a = build(Seq(
      (1L: java.lang.Long, 10L: java.lang.Long, 2L, "late"),
      (1L, 10L, 1L, "early")))
    val b = build(Seq(
      (1L: java.lang.Long, 10L: java.lang.Long, 1L, "early"),
      (1L, 10L, 2L, "late")))
    val fa = a.orderBy("version").select($"attr")
      .collect().map(_.getString(0)).toSeq
    assert(fa === b.orderBy("version").select($"attr")
      .collect().map(_.getString(0)).toSeq)
    assert(fa === Seq("early", "late"))
  }

  test("the whole build rides ONE shuffle Exchange") {
    val df = spark.range(1000).select(
      (col("id") % 50).as("k"), (col("id") * 7 % 997).as("ts"),
      col("id").as("tie"), concat(lit("v"), col("id") % 3).as("attr"))
    val plan = Scd.scd2(df, "k", "ts", "tie", Seq("attr"))
      .queryExecution.executedPlan.toString
    val nExchanges = plan.split("\n").count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange") &&
        !l.contains("BroadcastExchange"))
    assert(nExchanges === 1, s"expected one Exchange, plan:\n$plan")
  }
}
