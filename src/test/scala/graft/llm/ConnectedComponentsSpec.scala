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

  test("NULL-endpoint pairs link nothing — both paths agree") {
    // (None, 3) and (4, None) must NOT create edges; previously the
    // union-find path read NULL as node 0, silently welding 0 into a
    // component the distributed path never built
    val pairs = Seq(
      (Option(1L), Option(2L)),
      (Option.empty[Long], Option(3L)),
      (Option(4L), Option.empty[Long]),
      (Option(0L), Option(9L))).toDF("id_a", "id_b")
    val gate = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val dist = distributed(Dedup.connectedComponents(pairs, "id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 0L -> 0L, 9L -> 0L)
    assert(gate === expected)
    assert(dist === expected)
  }

  test("pairCountHint above the cap skips the probe and distributes; below keeps the gate") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val (gateLabels, gateRounds) = Dedup.connectedComponentsWithRounds(
      pairs, "id_a", "id_b", pairCountHint = 2L)
    assert(gateRounds === 0) // hint <= cap: union-find path
    val (distLabels, distRounds) = Dedup.connectedComponentsWithRounds(
      pairs, "id_a", "id_b", pairCountHint = 200001L)
    assert(distRounds > 0) // hint > cap: straight to distributed, no probe
    assert(gateLabels.as[(Long, Long)].collect().toMap ===
      distLabels.as[(Long, Long)].collect().toMap)
  }

  test("deep path graph: 10^4 nodes converge within the O(log d) bound") {
    // diameter 10^4 -> log2(d) ~ 13.3; pointer doubling halves label-chain
    // length each round on top of one-hop propagation, so rounds must land
    // within a small constant of log2(diameter). Plain propagation would
    // need ~10^4 rounds — this is the claim at Dedup.scala's doubling
    // comment, previously untested beyond 300 nodes.
    val n = 10000L
    val pairs = spark.range(n - 1)
      .selectExpr("id AS id_a", "id + 1 AS id_b")
    spark.conf.set("spark.graft.cc.localMax", "0")
    val (labels, rounds) = try
      Dedup.connectedComponentsWithRounds(pairs, "id_a", "id_b")
    finally spark.conf.unset("spark.graft.cc.localMax")
    val distinctLabels = labels.select("label").distinct()
      .as[Long].collect().toSeq
    assert(distinctLabels === Seq(0L))
    assert(labels.count() === n)
    val bound = (math.log(n.toDouble) / math.log(2)).ceil.toInt + 4
    assert(rounds <= bound,
      s"$rounds rounds on a diameter-$n path exceeds log2(d)+4 = $bound")
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
