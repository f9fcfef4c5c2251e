package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Run `body` with the union-find gate disabled, so the test exercises
    * the DISTRIBUTED propagation path (tiny test graphs would otherwise
    * all solve on the driver). Forcing happens at plan-BUILD time —
    * connectedComponents reads the conf when called — so the call must
    * happen inside; we take the call by-name. */
  private def distributed[T](body: => T): T = {
    spark.conf.set("spark.graft.cc.localMax", "0")
    try body finally spark.conf.unset("spark.graft.cc.localMax")
  }

  test("chains, triangles, and singleton-pair components resolve to min labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long path converges (propagation spans the diameter)") {
    val pairs = (0L until 15L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = distributed(Dedup.connectedComponents(pairs, "id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet === Set(0L))
    assert(out.size === 16)
  }

  test("adversarial diameter: a 300-node path converges in O(log d) rounds") {
    // plain min-label propagation would need ~300 rounds (>> maxIter 30);
    // pointer doubling must compress the chain geometrically. Worst-case
    // orientation: labels walk from one end.
    val pairs = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = distributed(
      Dedup.connectedComponents(pairs, "id_a", "id_b", maxIter = 15))
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet === Set(0L))
    assert(out.size === 301)
  }

  test("random graph: groups equal a union-find ground truth") {
    val rnd = new scala.util.Random(1234)
    val edges = Seq.fill(400)((rnd.nextInt(250).toLong, rnd.nextInt(250).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val truth = nodes.map(n => n -> find(n)).toMap
    // canonicalize: component representative = min node id
    val canon = truth.groupBy(_._2).flatMap { case (_, m) =>
      val mn = m.keys.min; m.keys.map(_ -> mn)
    }
    val out = Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(out === canon)
  }

  test("size gate: union-find and distributed paths agree; gate picks by pair count") {
    val rnd = new scala.util.Random(77)
    val edges = Seq.fill(300)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter { case (a, b) => a != b }
    val pairs = edges.toDF("id_a", "id_b")
    val (localDf, localRounds) =
      Dedup.connectedComponentsWithRounds(pairs, "id_a", "id_b")
    val (distDf, distRounds) = distributed(
      Dedup.connectedComponentsWithRounds(pairs, "id_a", "id_b"))
    assert(localRounds === 0, "below the gate the union-find path must run")
    assert(distRounds > 0, "localMax=0 must force the distributed path")
    assert(localDf.as[(Long, Long)].collect().toSet ===
      distDf.as[(Long, Long)].collect().toSet,
      "both physical paths must produce identical components")
  }

  test("malformed cc.localMax conf surfaces a clear error") {
    spark.conf.set("spark.graft.cc.localMax", "many")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.connectedComponents(
          Seq((1L, 2L)).toDF("id_a", "id_b"), "id_a", "id_b")
      }
      assert(e.getMessage.contains("spark.graft.cc.localMax"))
    } finally spark.conf.unset("spark.graft.cc.localMax")
  }
}
