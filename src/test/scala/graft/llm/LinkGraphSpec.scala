package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LinkGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Scalar reference PageRank with the SAME rounding discipline. */
  private def refRanks(edges: Seq[(Long, Long)], k: Int,
                       d: Double = 0.85): Map[Long, Double] = {
    def r12(x: Double) = math.floor(x * 1e12 + 0.5) / 1e12
    val simple = edges.distinct
    val nodes = simple.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val odeg = simple.groupBy(_._1).view.mapValues(_.size).toMap
    var ranks = nodes.map(_ -> 1.0 / n).toMap
    (0 until k).foreach { _ =>
      val contrib = simple
        .map { case (s, t) => t -> r12(ranks(s) / odeg(s)) }
        .groupBy(_._1).view
        .mapValues(_.map(v => BigDecimal(v._2)).sum.toDouble).toMap
      val dang = nodes.filterNot(odeg.contains)
        .map(x => BigDecimal(r12(ranks(x)))).sum.toDouble
      ranks = nodes.map(x => x -> r12((1 - d) / n +
        d * (contrib.getOrElse(x, 0.0) + dang / n))).toMap
    }
    ranks
  }

  private def run(edges: Seq[(Long, Long)], k: Int): Map[Long, Double] =
    LinkGraph.pageRank(edges.toDF("s", "t"), "s", "t", k)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("matches the scalar reference bit-for-bit on a dangling graph") {
    // 1 -> 2, 1 -> 3, 2 -> 3, 3 has no out-edges (dangling), 4 -> 1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L))
    (1 to 4).foreach { k =>
      assert(run(edges, k) === refRanks(edges, k), s"diverged at k=$k")
    }
  }

  test("rank mass stays ~1 and the hub outranks the spokes") {
    // star: everyone links to 0, 0 links to 1
    val edges = (1L to 9L).map(i => (i, 0L)) :+ (0L, 1L)
    val ranks = run(edges, 8)
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    assert(ranks(0L) > ranks(2L) * 3, "hub must dominate")
    // 1 receives the hub's whole rank, so it beats the other spokes
    assert(ranks(1L) > ranks(2L))
  }

  test("duplicate edges collapse; null endpoints drop") {
    val dup = Seq((1L, 2L), (1L, 2L), (2L, 1L))
    assert(run(dup, 3) === run(dup.distinct, 3))
    val withNull = Seq((Some(1L), Some(2L)), (None, Some(9L)),
      (Some(2L), Some(1L))).toDF("s", "t")
    val out = LinkGraph.pageRank(withNull, "s", "t", 3)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L))
  }

  /** Scalar reference HITS with the SAME L1/rounding discipline. */
  private def refHits(edges: Seq[(Long, Long)],
                      k: Int): Map[Long, (Double, Double)] = {
    def r12(x: Double) = math.floor(x * 1e12 + 0.5) / 1e12
    val simple = edges.distinct
    val nodes = simple.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var hub = nodes.map(_ -> 1.0 / nodes.size).toMap
    var auth = Map.empty[Long, Double]
    (0 until k).foreach { _ =>
      val aRaw = simple.map { case (s, t) => t -> BigDecimal(r12(hub(s))) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble).toMap
      // decimal sums are exact, hence order-insensitive — no sort needed
      val aSum = aRaw.values.map(v => BigDecimal(r12(v))).sum.toDouble
      auth = nodes.map(x => x -> r12(aRaw.getOrElse(x, 0.0) / aSum)).toMap
      val hRaw = simple.map { case (s, t) => s -> BigDecimal(r12(auth(t))) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble).toMap
      val hSum = hRaw.values.map(v => BigDecimal(r12(v))).sum.toDouble
      hub = nodes.map(x => x -> r12(hRaw.getOrElse(x, 0.0) / hSum)).toMap
    }
    nodes.map(x => x -> (hub(x), auth(x))).toMap
  }

  private def runHits(edges: Seq[(Long, Long)],
                      k: Int): Map[Long, (Double, Double)] =
    LinkGraph.hits(edges.toDF("s", "t"), "s", "t", k)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  test("hits matches the scalar reference bit-for-bit") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L), (4L, 3L))
    (1 to 3).foreach { k =>
      assert(runHits(edges, k) === refHits(edges, k), s"diverged at k=$k")
    }
  }

  test("pageRank/hits: the driver-local gate and the distributed solve " +
      "agree bit for bit (the cc both-paths discipline)") {
    // a messier graph than the reference fixtures: hub, spokes, a
    // 3-cycle, dangling sinks, a duplicate edge — 40 nodes
    val rnd = new scala.util.Random(7)
    val edges = (0 until 120).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2) ++ Seq((0L, 1L), (0L, 1L))
    def withGate[A](v: String)(body: => A): A = {
      spark.conf.set("spark.graft.linkgraph.localMax", v)
      try body finally
        spark.conf.set("spark.graft.linkgraph.localMax", "100000")
    }
    val prLocal = withGate("100000") { run(edges, 4) }
    val prDist = withGate("0") { run(edges, 4) }
    assert(prLocal === prDist, "pageRank local vs distributed diverged")
    val hLocal = withGate("100000") { runHits(edges, 3) }
    val hDist = withGate("0") { runHits(edges, 3) }
    assert(hLocal === hDist, "hits local vs distributed diverged")
    // and the probe itself: a gate BELOW the edge count must distribute
    // (row identity again — the fall-through path is the same solve)
    val prSmallGate = withGate("5") { run(edges, 2) }
    assert(prSmallGate === withGate("0") { run(edges, 2) })
    // the integer family: lpa labels, kCore survivors+degrees, the
    // triangle count — structural parity, but gate it anyway
    def lpaOf(): Set[(Long, Long)] =
      LinkGraph.lpa(edges.toDF("s", "t"), "s", "t", 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withGate("100000")(lpaOf()) === withGate("0")(lpaOf()),
      "lpa local vs distributed diverged")
    def kcOf(): Set[(Long, Long)] =
      LinkGraph.kCore(edges.toDF("s", "t"), "s", "t", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withGate("100000")(kcOf()) === withGate("0")(kcOf()),
      "kCore local vs distributed diverged")
    def triOf(): (Long, Long) = {
      val r = LinkGraph.triangles(edges.toDF("s", "t"), "s", "t").head()
      (r.getLong(0), r.getLong(1))
    }
    assert(withGate("100000")(triOf()) === withGate("0")(triOf()),
      "triangles local vs distributed diverged")
    // the walk family (round 17): bfs hop labels and bounded-round
    // Bellman-Ford distances — integer results, but gate parity anyway;
    // seeds include a node absent from the edge list (isolated seed
    // must surface at hop 0 / dist 0 on BOTH paths)
    val seeds = Seq(0L, 5L, 99L).toDF("n")
    def bfsOf(r: Int): Set[(Long, Long)] =
      LinkGraph.bfsHops(edges.toDF("s", "t"), "s", "t", seeds, "n", r)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    (0 to 3).foreach { r =>
      assert(withGate("100000")(bfsOf(r)) === withGate("0")(bfsOf(r)),
        s"bfsHops local vs distributed diverged at rounds=$r")
    }
    val wedges = edges.map { case (a, b) => (a, b, (a * 7 + b * 13) % 97 + 1) }
    def ssspOf(r: Int): Set[(Long, Long)] =
      LinkGraph.sssp(wedges.toDF("s", "t", "w"), "s", "t", "w",
          seeds, "n", r)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    (0 to 3).foreach { r =>
      assert(withGate("100000")(ssspOf(r)) === withGate("0")(ssspOf(r)),
        s"sssp local vs distributed diverged at rounds=$r")
    }
    // under-gate fall-through for the walks too
    assert(withGate("5")(bfsOf(2)) === withGate("0")(bfsOf(2)))
    assert(withGate("5")(ssspOf(2)) === withGate("0")(ssspOf(2)))
  }

  private def runTri(edges: Seq[(Long, Long)]): (Long, Long) = {
    val r = LinkGraph.triangles(edges.toDF("s", "t"), "s", "t").head()
    (r.getLong(0), r.getLong(1))
  }

  test("triangles: known graphs, duplicate/reverse/self edges collapse") {
    // K4 has C(4,3) = 4 triangles
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(runTri(k4) === ((4L, 6L)))
    // star has none
    assert(runTri((1L to 6L).map(i => (0L, i))) === ((0L, 6L)))
    // triangle + pendant; reverse duplicates and self-loops don't count
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 3L),
      (3L, 4L), (1L, 2L))
    assert(runTri(messy) === ((1L, 4L)))
  }

  test("triangles: orientation agrees with brute force on a random graph") {
    val rnd = new scala.util.Random(159L)
    val edges = Seq.fill(160)((rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
      .filter { case (a, b) => a != b }
    val simple = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj = simple.toSet
    val nodes = simple.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var brute = 0L
    for {
      i <- nodes.indices; j <- i + 1 until nodes.size
      k <- j + 1 until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if adj((a, b)) && adj((b, c)) && adj((a, c))
    } brute += 1
    assert(runTri(edges) === ((brute, simple.size.toLong)))
  }

  test("kCore: known graphs peel to the right core, brute force agrees") {
    def runCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
      LinkGraph.kCore(edges.toDF("s", "t"), "s", "t", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4 with a pendant chain: 3-core is exactly the K4, each deg 3;
    // the chain must peel in CASCADE (5 then 4 become degree-deficient)
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val g = k4 ++ Seq((3L, 4L), (4L, 5L))
    assert(runCore(g, 3) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // a pure cycle survives k=2 untouched and vanishes at k=3
    val cycle = (0L until 6L).map(i => (i, (i + 1) % 6))
    assert(runCore(cycle, 2).values.toSet === Set(2L))
    assert(runCore(cycle, 3) === Map.empty)
    // brute-force fixpoint agreement on a random graph; dup/self drop
    val rnd = new scala.util.Random(174L)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    var simple = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    var changed = true
    while (changed) {
      val deg = simple.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bad = deg.filter(_._2 < 3).keySet
      changed = bad.nonEmpty
      simple = simple.filter { case (a, b) => !bad(a) && !bad(b) }
    }
    val brute = simple.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(runCore(edges, 3) === brute)
  }

  test("hits: pure hub gets auth 0, pure authority gets hub 0; L1 mass 1") {
    // 1,2,4 all point at 3; 3 points nowhere; nothing points at 1
    val edges = Seq((1L, 3L), (2L, 3L), (4L, 3L), (2L, 4L))
    val out = runHits(edges, 4)
    assert(out(1L)._2 === 0.0, "no in-edges -> auth 0")
    assert(out(3L)._1 === 0.0, "no out-edges -> hub 0")
    assert(out(3L)._2 > out(4L)._2, "3 is the dominant authority")
    assert(math.abs(out.values.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-9)
  }

  /** Scalar reference LPA: synchronous rounds, most-frequent neighbor
    * label, min-label ties — the exact contract lpa() documents. */
  private def refLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    var labels = nbrs.keys.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      labels = nbrs.map { case (n, ns) =>
        val votes = ns.map(labels).groupBy(identity).view
          .mapValues(_.size).toMap
        val best = votes.values.max
        n -> votes.filter(_._2 == best).keys.min
      }
    }
    labels
  }

  private def runLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LinkGraph.lpa(edges.toDF("s", "t"), "s", "t", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("lpa matches the scalar reference on two bridged cliques") {
    // cliques {1,2,3,4} and {10,11,12,13}, one bridge 4-10
    val k1 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val k2 = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val edges = (k1 ++ k2 :+ (4L, 10L)).toSeq
    (1 to 4).foreach { k =>
      assert(runLpa(edges, k) === refLpa(edges, k), s"iters=$k")
    }
    // after enough rounds each clique agrees on its min label
    val fin = runLpa(edges, 4)
    assert(Set(1L, 2L, 3L).map(fin) === Set(1L))
    assert(Set(11L, 12L, 13L).map(fin) === Set(10L))
  }

  test("lpa: duplicate/reverse/self edges collapse; nulls drop") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (null, 3L), (3L, null))
      .toDF("s", "t")
    // a single undirected edge is bipartite: synchronous LPA swaps the
    // two labels every round (the documented K-fixed-rounds contract —
    // deterministic, oracle-replayable; NOT a convergence promise)
    val r1 = LinkGraph.lpa(df, "s", "t", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(1L -> 2L, 2L -> 1L)) // node 3 has no real edge
    val r2 = LinkGraph.lpa(df, "s", "t", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(1L -> 1L, 2L -> 2L))
  }

  test("lpa: star oscillates synchronously, matching the reference") {
    // hub+spokes is bipartite too: hub and spoke labels alternate
    // (1->spoke-min, spokes->1, then back) — assert the exact sequence
    // agrees with the scalar reference at every depth
    val edges = (2L to 6L).map(i => (1L, i))
    (1 to 4).foreach { k =>
      assert(runLpa(edges, k) === refLpa(edges, k), s"iters=$k")
    }
    val r2 = runLpa(edges, 2)
    assert(r2(1L) === 1L && (2L to 6L).forall(r2(_) === 2L))
  }
}
