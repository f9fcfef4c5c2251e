package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming CUSUM monitor must (a) finalize a day only when a newer
  * day appears for the key, (b) match the sequential recurrence exactly
  * across micro-batch boundaries, and (c) drop rows arriving for an
  * already-finalized day (the T4 late-data posture) instead of corrupting
  * finalized state. */
class CusumMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(batches: Seq[Seq[(String, Long)]],
                  baseline: Map[String, (Long, Long)])
      : Seq[(String, Long, Long, Long, Boolean)] = {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = Streams.cusumMonitor(mem.toDS(), baseline)
      .writeStream.format("memory").queryName("cusum_mon_test")
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val out = spark.table("cusum_mon_test")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    spark.catalog.dropTempView("cusum_mon_test")
    out
  }

  test("recurrence matches the sequential form across batch boundaries") {
    // key a: counts 2,2,2,5,5 over days 0..4 (day 4 stays open);
    // baseline med=2 => x = 0,0,0,3,(open)
    val mkDay = (d: Long, n: Int) => Seq.fill(n)(("a", d))
    val batches = Seq(
      mkDay(0, 2) ++ mkDay(1, 2),          // finalizes day 0
      mkDay(2, 2) ++ mkDay(3, 5),          // finalizes days 1, 2
      mkDay(4, 5))                         // finalizes day 3; 4 open
    val out = run(batches, Map("a" -> (2L, 1L)))
    val expected = Seq(
      ("a", 0L, 2L, 0L, false),
      ("a", 1L, 2L, 0L, false),
      ("a", 2L, 2L, 0L, false),
      ("a", 3L, 5L, 3L, false)) // S=3, h=5 => no alarm
    assert(out == expected)
  }

  test("planted shift alarms; late row for a finalized day is dropped") {
    val mkDay = (d: Long, n: Int) => Seq.fill(n)(("a", d))
    val batches = Seq(
      mkDay(0, 2) ++ mkDay(1, 2) ++ mkDay(2, 6) ++ mkDay(3, 6) ++
        mkDay(4, 6) ++ mkDay(5, 1),
      // day 1 is long finalized — this row must be DROPPED, leaving
      // day-2..4 drawups untouched
      mkDay(1, 3) ++ mkDay(6, 1))
    val out = run(batches, Map("a" -> (2L, 1L)))
    // S: day0 0, day1 0, day2 4, day3 8, day4 12; h = 5
    assert(out.map(r => (r._2, r._4, r._5)) == Seq(
      (0L, 0L, false), (1L, 0L, false), (2L, 4L, false),
      (3L, 8L, true), (4L, 12L, true), (5L, 11L, true)))
  }

  test("unknown key degrades to med 0 / mad 0 (h = hMult)") {
    val out = run(Seq(Seq(("z", 0L), ("z", 0L), ("z", 1L))),
      Map.empty[String, (Long, Long)])
    // med 0: x = count; day0 count 2 => S 2, h = 5 => no alarm
    assert(out == Seq(("z", 0L, 2L, 2L, false)))
  }
}
