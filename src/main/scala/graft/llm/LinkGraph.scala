package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph authority scoring — PageRank (Brin & Page 1998) over a
  * (src, dst) edge table: the crawl-prioritization signal (which hosts/
  * pages deserve crawl budget) and a classic fixed-point iteration the
  * engine should express distributively, like
  * [[Dedup.connectedComponents]]'s label propagation.
  *
  * Shape per iteration (driver loop, data distributed): contributions
  * ride ONE equi-join of the edge table against the current ranks plus
  * one aggregation on dst; the dangling mass (rank parked on nodes with
  * no out-edges) is a one-row aggregate broadcast back into the affine
  * update. `localCheckpoint` truncates lineage each round (the CC
  * discipline — iterative self-joins otherwise nest every previous round
  * into the plan). Edge/out-degree frames are cached across iterations.
  *
  * DETERMINISM: every per-node sum is an exact DECIMAL sum of
  * 12-decimal-rounded terms (double sums are the only order-sensitive
  * step in the algorithm; decimals are associative), and every other
  * operation — rank/odeg divide, the affine update, the final rounding —
  * is a fixed IEEE sequence, so an external oracle that unrolls the same
  * K iterations reproduces every rank bit-for-bit. Fixed iteration
  * count, no convergence epsilon: a float-threshold stop would be a
  * knife-edge for an oracle to disagree on.
  */
object LinkGraph {

  private def r12(c: Column): Column = floor(c * 1e12 + 0.5) / 1e12
  private def dec(c: Column): Column = r12(c).cast("decimal(28,12)")

  /** Ranks after exactly `iterations` rounds: (node, rank). NULL
    * endpoints drop; duplicate edges collapse (PageRank is defined on
    * the simple graph); isolated dst-only nodes participate (they
    * receive and re-emit via the dangling term). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().cache()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("odeg")).cache()
    val withDeg = e.join(outDeg, Seq("src")).cache()
    val n = nodes.count()
    require(n > 0, "pageRank on an empty (or all-NULL) edge set")
    // the dangling-node SET never changes across iterations — only its
    // rank mass does; computing it once spares one anti-join per round
    val dangNodes = nodes
      .join(outDeg, col("node") === col("src"), "left_anti")
      .select("node").cache()
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    var i = 0
    while (i < iterations) {
      val contribs = withDeg
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), dec(col("rank") / col("odeg")).as("c"))
        .groupBy("dst").agg(sum(col("c")).cast("double").as("contrib"))
      val dang = ranks
        .join(dangNodes, Seq("node"), "left_semi")
        .agg(coalesce(sum(dec(col("rank"))),
          lit(0).cast("decimal(28,12)")).cast("double").as("dmass"))
      ranks = nodes
        .join(contribs, col("node") === col("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          r12(lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) +
              col("dmass") / lit(n.toDouble))).as("rank"))
        .localCheckpoint()
      i += 1
    }
    // ranks is localCheckpoint-materialized — the iteration caches are no
    // longer reachable from it; drop them so repeated calls in one session
    // don't accumulate cached blocks
    Seq(e, nodes, outDeg, withDeg, dangNodes).foreach(_.unpersist())
    ranks
  }

  /** HITS hub/authority scores (Kleinberg 1999, "Authoritative sources
    * in a hyperlinked environment") after exactly `iterations` rounds:
    * (node, hub, auth). The OTHER classic link signal beside
    * [[pageRank]] — authority separates "pointed at by good hubs" from
    * "points at good authorities", the pair a crawl scheduler actually
    * wants (fetch authorities, mine hubs for frontier links).
    *
    * Same distributed shape as pageRank: each half-step is ONE
    * equi-join of the edge table against the current scores plus one
    * aggregation on the receiving endpoint; normalization is a one-row
    * aggregate broadcast back into the divide. Standard HITS normalizes
    * by the L2 norm; this implementation normalizes by the L1 norm
    * (scores sum to 1) — the fixed-point direction is identical (the
    * norms differ by a per-iteration scalar, which normalization
    * cancels), and dropping the sqrt keeps every step inside the
    * engine's decimal-sum determinism contract (see the class doc): an
    * external oracle unrolling the same K iterations reproduces every
    * score bit-for-bit. auth updates from current hubs, then hub from
    * the NEW auths (the standard sequencing); nodes with no in-edges
    * hold auth 0, no out-edges hub 0. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int): DataFrame = {
    require(iterations >= 1, "hits needs at least one iteration")
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    require(n > 0, "hits on an empty (or all-NULL) edge set")
    var hubs = nodes.withColumn("hub", lit(1.0 / n)).localCheckpoint()
    var auths: DataFrame = null
    var i = 0
    while (i < iterations) {
      val aRaw = e.join(hubs, col("src") === col("node"))
        .select(col("dst"), dec(col("hub")).as("c"))
        .groupBy("dst").agg(sum(col("c")).cast("double").as("a"))
      val aSum = aRaw.agg(sum(dec(col("a"))).cast("double").as("asum"))
      auths = nodes
        .join(aRaw, col("node") === col("dst"), "left")
        .crossJoin(broadcast(aSum))
        .select(col("node"),
          r12(coalesce(col("a"), lit(0.0)) / col("asum")).as("auth"))
        .localCheckpoint()
      val hRaw = e.join(auths, col("dst") === col("node"))
        .select(col("src"), dec(col("auth")).as("c"))
        .groupBy("src").agg(sum(col("c")).cast("double").as("h"))
      val hSum = hRaw.agg(sum(dec(col("h"))).cast("double").as("hsum"))
      hubs = nodes
        .join(hRaw, col("node") === col("src"), "left")
        .crossJoin(broadcast(hSum))
        .select(col("node"),
          r12(coalesce(col("h"), lit(0.0)) / col("hsum")).as("hub"))
        .localCheckpoint()
      i += 1
    }
    val out = hubs.join(auths, Seq("node"))
    Seq(e, nodes).foreach(_.unpersist())
    out
  }

  /** Triangle count of the UNDIRECTED simple graph underlying a
    * (src, dst) edge table — the clustering signal (spam farms are
    * triangle-dense, genuine link neighborhoods sparse) and the classic
    * "curse of the last reducer" problem (Suri & Vassilvitskii 2011):
    * naive wedge generation explodes on hub nodes (a degree-d node
    * yields d² wedges). The fix is DEGREE ORIENTATION — direct every
    * edge from its lower-(degree, id) endpoint to the higher — which
    * bounds every out-degree by O(√m), so wedges are generated only at
    * each triangle's lowest-rank vertex and the self-join fan-out is
    * bounded even on power-law graphs. Each triangle is counted exactly
    * once (its minimum-rank vertex owns it).
    *
    * Shape: degree aggregation, one self-join of the oriented edges on
    * source, one semi-join closing wedges against the oriented edge
    * set — three shuffles total, each on plain integer keys. Returns
    * one row: (n_triangles, n_edges). Self-loops drop; duplicate and
    * reverse-duplicate edges collapse. */
  /** Synchronous label propagation (Raghavan et al. 2007), K FIXED
    * rounds: every node starts as its own label; each round every node
    * adopts the most frequent label among its neighbors, ties broken
    * by the MINIMUM label. Both choices are determinism engineering:
    * asynchronous/random-order LPA (the paper's default) is
    * run-dependent by construction, and a float-threshold stop would
    * hand the oracle a convergence disagreement — K fixed synchronous
    * rounds make the result a pure function of the edge set, so an
    * external engine can replay it layer by layer (the
    * pageRank/HITS/kCore oracle contract).
    *
    * One round = one edge-vs-labels equi-join + one (node, label)
    * count + one per-node argmax (max over struct(cnt, -label) — no
    * window, no sort); `localCheckpoint` truncates lineage per round.
    * Every node in the edge set has >= 1 neighbor, so each round
    * relabels ALL nodes (no outer-join seam). The standard community/
    * boilerplate-cluster detector beside [[kCore]]'s density filter. */
  def lpa(edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters out of range: $iters")
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val nbrs = und.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("node"), col("a").as("nbr")))
      .localCheckpoint()
    var labels = nbrs.select(col("node")).distinct()
      .select(col("node"), col("node").as("label"))
    (1 to iters).foreach { _ =>
      labels = nbrs
        .join(labels.select(col("node").as("nbr"), col("label")),
          Seq("nbr"))
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        .agg(max(struct(col("cnt"),
          (-col("label")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** k-core decomposition by iterative peeling: repeatedly delete every
    * node of degree < k (simultaneously — one round is ONE degree
    * aggregation + two anti-joins, all keyed shuffles) until the
    * degree->=k fixpoint. Returns the surviving nodes with their CORE
    * degrees (degree within the k-core subgraph) — the standard
    * spam-farm / boilerplate-cluster prefilter on a link graph (dense
    * cores are link farms; the 1-core..2-core shell is the long tail a
    * crawl can deprioritize).
    *
    * Scale posture: the peel converges in at most the graph's
    * degeneracy-ordering depth — usually a handful of rounds on web
    * graphs (each round removes ALL current low-degree nodes at once);
    * `localCheckpoint` truncates lineage per round (the
    * connectedComponents discipline) and the per-round driver action is
    * one `isEmpty` probe of the bad set. A pathological path/chain
    * graph peels in O(n/2) rounds — `maxIter` fail-fasts rather than
    * looping unbounded (the RangeJoin discipline). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxIter: Int = 60): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct().localCheckpoint()
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val bad = degrees(und).filter(col("deg") < k).select("node")
      if (bad.isEmpty) converged = true
      else {
        und = und
          .join(bad.withColumnRenamed("node", "a"), Seq("a"), "left_anti")
          .join(bad.withColumnRenamed("node", "b"), Seq("b"), "left_anti")
          .localCheckpoint()
        it += 1
      }
    }
    require(converged, s"kCore: no fixpoint within $maxIter peel rounds " +
      "(pathological chain graph? raise maxIter)")
    degrees(und)
  }

  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct().cache()
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient a<->b from the lower (deg, id) endpoint to the higher:
    // rank comparisons need both endpoints' degrees in the row
    val o = und
      .join(deg.withColumnRenamed("node", "a")
        .withColumnRenamed("deg", "da"), Seq("a"))
      .join(deg.withColumnRenamed("node", "b")
        .withColumnRenamed("deg", "db"), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("from"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("to"),
        greatest(struct(col("da").as("d"), col("a").as("n")),
          struct(col("db").as("d"), col("b").as("n"))).as("rto"))
      .cache()
    // distinct column names on both sides: a self-join via df("col")
    // on one lineage resolves both sides to the same attribute
    val o1 = o.select(col("from").as("w1"), col("to").as("wa"),
      col("rto").as("ra"))
    val o2 = o.select(col("from").as("w2"), col("to").as("wb"),
      col("rto").as("rb"))
    val wedges = o1.join(o2,
        col("w1") === col("w2") && col("ra") < col("rb"))
      .select(col("wa"), col("wb"))
    val tri = wedges.join(o.select(col("from").as("wa"), col("to").as("wb")),
        Seq("wa", "wb"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val out = tri.crossJoin(
      broadcast(und.agg(count(lit(1)).as("n_edges"))))
      // one-row result: materialize it so the iteration caches can drop
      // (the pageRank unpersist discipline)
      .localCheckpoint()
    Seq(und, o).foreach(_.unpersist())
    out
  }
}
