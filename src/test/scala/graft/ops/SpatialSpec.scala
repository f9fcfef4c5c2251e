package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Grid eps-neighbor self-join: brute-force parity (including boundary
  * and cross-cell pairs), exactly-once surfacing, NULL posture, and the
  * no-cartesian plan contract. */
class SpatialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pts = Seq(
    (1L, 0.0, 0.0),    // cell (0,0)
    (2L, 0.3, 0.4),    // same cell, d=0.5 from #1 — boundary EQUAL case
    (3L, -0.1, 0.1),   // neighbor cell (-1,0): cross-cell pair with #1
    (4L, 0.49, -0.01), // neighbor cell (0,-1)
    (5L, 10.0, 10.0),  // isolated
    (6L, 0.0, 0.0))    // duplicate point of #1: d=0

  test("matches brute force, boundary-inclusive, each pair once") {
    val df = pts.toDF("id", "lat", "lon")
    val got = Spatial.epsNeighborJoin(df, "id", "lat", "lon", 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().sorted.toSeq
    val brute = for {
      (a, alat, alon) <- pts; (b, blat, blon) <- pts
      if a < b
      d2 = (alat - blat) * (alat - blat) + (alon - blon) * (alon - blon)
      if d2 <= 0.25
    } yield (a, b)
    assert(got === brute.sorted)
    assert(got.distinct === got) // exactly once, no post-join dedup debt
    assert(got.contains((1L, 2L))) // d == eps exactly is IN
    assert(got.contains((1L, 3L))) // cross-cell neighbor found
    assert(got.contains((1L, 6L))) // coincident points pair once
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("NULL id or coordinate rows never pair") {
    val df = Seq[(java.lang.Long, java.lang.Double, java.lang.Double)](
      (1L, 0.0, 0.0), (2L, 0.1, 0.0),
      (null, 0.0, 0.1), (3L, null, 0.0), (4L, 0.0, null))
      .toDF("id", "lat", "lon")
    val got = Spatial.epsNeighborJoin(df, "id", "lat", "lon", 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("plan is an equi hash join on cells — no cartesian, no BNLJ") {
    val df = pts.toDF("id", "lat", "lon")
    val plan = Spatial.epsNeighborJoin(df, "id", "lat", "lon", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("negative eps is rejected loudly") {
    val df = pts.toDF("id", "lat", "lon")
    intercept[IllegalArgumentException] {
      Spatial.epsNeighborJoin(df, "id", "lat", "lon", -1.0)
    }
  }

  test("epsJoin: two-dataset pairs match brute force, each once") {
    val left = pts.toDF("eid", "lat", "lon")
    val rightPts = Seq((100L, 0.2, 0.2), (101L, 10.1, 10.0),
      (102L, 0.0, 0.0), (103L, -5.0, 5.0))
    val right = rightPts.toDF("pid", "lat", "lon")
    val got = Spatial.epsJoin(left, "eid", right, "pid", "lat", "lon", 0.5)
      .select($"eid", $"pid").as[(Long, Long)].collect().sorted.toSeq
    val brute = for {
      (a, alat, alon) <- pts; (b, blat, blon) <- rightPts
      d2 = (alat - blat) * (alat - blat) + (alon - blon) * (alon - blon)
      if d2 <= 0.25
    } yield (a, b)
    assert(got === brute.sorted)
    assert(got.distinct === got)
    // coincident cross-relation points pair (no id< suppression here)
    assert(got.contains((1L, 102L)) && got.contains((6L, 102L)))
    assert(got.contains((5L, 101L))) // cross-cell neighbor on the POI side
  }

  test("epsJoin: identical id names are rejected loudly") {
    val df = pts.toDF("id", "lat", "lon")
    intercept[IllegalArgumentException] {
      Spatial.epsJoin(df, "id", df, "id", "lat", "lon", 0.5)
    }
  }
}
