package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Blocked fuzzy join: recall within the design envelope, no all-pairs
  * plan, edit-distance filter exactness. */
class FuzzySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val canon = Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"),
    (4L, "delta"), (5L, "alphx")).toDF("entity", "name")

  test("matches every mention within maxDist when the head survives") {
    val mentions = Seq(
      (10L, "alpha"),   // exact
      (11L, "alpa"),    // delete
      (12L, "alphaa"),  // insert
      (13L, "charlye"), // replace
      (14L, "dzlta"),   // replace mid
      (15L, "zzzzz"))   // no match
      .toDF("doc_id", "mention")
    val out = Fuzzy.blockedJoin(mentions, canon, "mention", "name", 2)
      .select("doc_id", "entity", "lev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // alpha matches both alpha(0) and alphx(1); alpa both at 1/2
    assert(out === Set(
      (10L, 1L, 0), (10L, 5L, 1),
      (11L, 1L, 1), (11L, 5L, 2),
      (12L, 1L, 1), (12L, 5L, 2),
      (13L, 3L, 1), (14L, 4L, 1)))
  }

  test("head-char blocking is the documented recall boundary") {
    val mentions = Seq((1L, "xlpha")).toDF("doc_id", "mention")
    // distance 1 from 'alpha' but the head char changed -> by design
    // the block key misses it
    assert(Fuzzy.blockedJoin(mentions, canon, "mention", "name", 2)
      .count() === 0)
  }

  test("null/empty strings drop; plan is an equi-join, not a cross") {
    val mentions = Seq((1L, null.asInstanceOf[String]), (2L, ""),
      (3L, "bravo")).toDF("doc_id", "mention")
    val out = Fuzzy.blockedJoin(mentions, canon, "mention", "name", 1)
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(3L))
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("cartesianproduct") &&
      !plan.contains("broadcastnestedloop"), plan)
  }
}
