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

  // ---- driver-local fast path (the CC localMax discipline) -------------
  // A fixed-point iteration over a BROADCAST-SCALE graph pays K × (2
  // joins + 2 aggregations + 2 localCheckpoint materializations) of pure
  // stage-scheduling cost — microseconds of arithmetic behind seconds of
  // scheduling (q155's 97-node fixture graph measured 3.5 s distributed).
  // Below `spark.graft.linkgraph.localMax` DISTINCT edges (default
  // 100 000, ~1.6 MB of longs; 0 disables) the iterations run on the
  // driver over the collected edge list. Long-keyed edges only; other
  // key types always distribute. The probe IS the fetch:
  // `limit(localMax+1).collect()` — over the cap, fall through (the
  // completed map stages are reused by the distributed solve).
  //
  // BIT-PARITY is the whole contract (the DuckDB oracles replay the
  // distributed arithmetic): the local solve reproduces the exact
  // operation sequence — r12 = floor(x·1e12+0.5)/1e12 in pure IEEE ops;
  // dec = r12 then double→DECIMAL(28,12) (Spark casts via the double's
  // shortest decimal representation, HALF_UP to scale 12 =
  // BigDecimal.valueOf(d).setScale(12, HALF_UP)); per-node sums are
  // EXACT decimal additions (associative, so a HashMap accumulation
  // order is immaterial); decimal→double is BigDecimal.doubleValue.
  // LinkGraphSpec pins both-paths row identity.
  private def r12d(x: Double): Double = math.floor(x * 1e12 + 0.5) / 1e12
  private def decD(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(r12d(x))
      .setScale(12, java.math.RoundingMode.HALF_UP)

  /** Collected long-keyed edges when the graph fits the local gate;
    * None ⟹ distribute. `e` must be the NULL-filtered DISTINCT
    * (src, dst) frame. */
  private def localEdges(e: DataFrame): Option[Array[(Long, Long)]] = {
    val sess = e.sparkSession
    val localMax = {
      val raw = sess.conf.get("spark.graft.linkgraph.localMax", "100000")
      try raw.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"spark.graft.linkgraph.localMax must be a long, got '$raw'")
      }
    }
    val longKeyed = e.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (localMax <= 0 || !longKeyed) return None
    val probe = e.limit(localMax.toInt + 1).collect()
    if (probe.length > localMax) None
    else Some(probe.map(r => (r.getLong(0), r.getLong(1))))
  }

  /** [[localEdges]] for a weighted (from, to, w) triple frame: one
    * limit-probe that IS the fetch, all three columns long-keyed. */
  private def localTriples(e: DataFrame): Option[Array[(Long, Long, Long)]] = {
    val sess = e.sparkSession
    val localMax = {
      val raw = sess.conf.get("spark.graft.linkgraph.localMax", "100000")
      try raw.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"spark.graft.linkgraph.localMax must be a long, got '$raw'")
      }
    }
    val longKeyed = e.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (localMax <= 0 || !longKeyed) return None
    val probe = e.limit(localMax.toInt + 1).collect()
    if (probe.length > localMax) None
    else Some(probe.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  private def localResult(sess: org.apache.spark.sql.SparkSession,
                          rows: Seq[org.apache.spark.sql.Row],
                          schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import scala.jdk.CollectionConverters._
    sess.createDataFrame(rows.asJava, schema)
  }

  /** Ranks after exactly `iterations` rounds: (node, rank). NULL
    * endpoints drop; duplicate edges collapse (PageRank is defined on
    * the simple graph); isolated dst-only nodes participate (they
    * receive and re-emit via the dangling term). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    localEdges(e0) match {
      case Some(collected) =>
        return pageRankLocal(edges.sparkSession, collected, iterations,
          damping)
      case None => // fall through to the distributed solve
    }
    val e = e0.cache()
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

  /** Driver-local [[pageRank]] — the exact distributed operation
    * sequence over a collected edge list (see the localEdges contract):
    * dec-quantized per-edge contributions summed exactly, the dangling
    * mass fold, the identical affine update. HashMap accumulation order
    * is immaterial because the decimal additions are associative. */
  private def pageRankLocal(sess: org.apache.spark.sql.SparkSession,
                            edges: Array[(Long, Long)], iterations: Int,
                            damping: Double): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.length.toLong
    require(n > 0, "pageRank on an empty (or all-NULL) edge set")
    val odeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length }
    val dang = nodes.filterNot(odeg.contains)
    var rank: Map[Long, Double] = nodes.map(_ -> 1.0 / n).toMap
    var i = 0
    while (i < iterations) {
      val contribs =
        new scala.collection.mutable.HashMap[Long, java.math.BigDecimal]()
      edges.foreach { case (s, d) =>
        val c = decD(rank(s) / odeg(s))
        contribs.updateWith(d) {
          case Some(acc) => Some(acc.add(c))
          case None => Some(c)
        }
      }
      val contribD = contribs.map { case (k, v) => k -> v.doubleValue }
      val dmass = dang.foldLeft(java.math.BigDecimal.ZERO) {
        (acc, x) => acc.add(decD(rank(x))) }.doubleValue
      rank = nodes.map { nd =>
        nd -> r12d((1 - damping) / n + damping *
          (contribD.getOrElse(nd, 0.0) + dmass / n.toDouble))
      }.toMap
      i += 1
    }
    localResult(sess, nodes.toSeq.map(nd => Row(nd, rank(nd))),
      StructType(Seq(StructField("node", LongType),
        StructField("rank", DoubleType))))
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
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    localEdges(e0) match {
      case Some(collected) =>
        return hitsLocal(edges.sparkSession, collected, iterations)
      case None => // fall through to the distributed solve
    }
    val e = e0.cache()
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

  /** Driver-local [[hits]] — the exact distributed half-step sequence
    * over a collected edge list: auth from current hubs (dec-quantized
    * per-edge terms, exact decimal sums, one L1 normalization fold),
    * then hub from the NEW auths. */
  private def hitsLocal(sess: org.apache.spark.sql.SparkSession,
                        edges: Array[(Long, Long)],
                        iterations: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.length.toLong
    require(n > 0, "hits on an empty (or all-NULL) edge set")
    var hub: Map[Long, Double] = nodes.map(_ -> 1.0 / n).toMap
    var auth: Map[Long, Double] = null
    // one half-step: per-receiver exact decimal sum of dec(score(sender)),
    // cast to double, then the L1 normalization (sum of dec(raw) -> the
    // divide -> r12), NULL-absent receivers scoring 0.0 — the literal
    // replay of the distributed join + agg + crossJoin(broadcast) chain
    def halfStep(score: Map[Long, Double],
                 byEdge: Array[(Long, Long)]): Map[Long, Double] = {
      val raw = new scala.collection.mutable.HashMap[Long, java.math.BigDecimal]()
      byEdge.foreach { case (sender, receiver) =>
        val c = decD(score(sender))
        raw.updateWith(receiver) {
          case Some(acc) => Some(acc.add(c))
          case None => Some(c)
        }
      }
      val rawD = raw.map { case (k, v) => k -> v.doubleValue }
      val norm = rawD.values.foldLeft(java.math.BigDecimal.ZERO) {
        (acc, x) => acc.add(decD(x)) }.doubleValue
      nodes.map(nd => nd -> r12d(rawD.getOrElse(nd, 0.0) / norm)).toMap
    }
    val rev = edges.map { case (s, d) => (d, s) }
    var i = 0
    while (i < iterations) {
      auth = halfStep(hub, edges) // sender = src's hub, receiver = dst
      hub = halfStep(auth, rev)   // sender = dst's auth, receiver = src
      i += 1
    }
    localResult(sess,
      nodes.toSeq.map(nd => Row(nd, hub(nd), auth(nd))),
      StructType(Seq(StructField("node", LongType),
        StructField("hub", DoubleType), StructField("auth", DoubleType))))
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
    localEdges(und) match {
      case Some(collected) =>
        return lpaLocal(edges.sparkSession, collected, iters)
      case None => // fall through to the distributed solve
    }
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

  /** Driver-local [[lpa]]: the identical synchronous rounds over a
    * collected edge list — per-node neighbor-label counts, argmax by
    * (count desc, label asc). Pure integer arithmetic, so parity with
    * the distributed solve is structural, not numeric. */
  private def lpaLocal(sess: org.apache.spark.sql.SparkSession,
                       und: Array[(Long, Long)], iters: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val adj = (und.map(e => e._1 -> e._2) ++ und.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    val nodes = adj.keys.toArray
    var labels: Map[Long, Long] = nodes.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      labels = nodes.map { n =>
        val counts = adj(n).map(labels)
          .groupBy(identity).map { case (l, xs) => l -> xs.length }
        // max struct(cnt, -label) = most frequent, ties to MIN label
        n -> counts.maxBy { case (l, c) => (c, -l) }._1
      }.toMap
    }
    localResult(sess, nodes.toSeq.map(n => Row(n, labels(n))),
      StructType(Seq(StructField("node", LongType),
        StructField("label", LongType))))
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
    val und0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    localEdges(und0) match {
      case Some(collected) =>
        return kCoreLocal(edges.sparkSession, collected, k, maxIter)
      case None => // fall through to the distributed solve
    }
    var und = und0.localCheckpoint()
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

  /** Driver-local [[kCore]]: identical simultaneous peel rounds over a
    * collected canonical edge list. Pure integer arithmetic. */
  private def kCoreLocal(sess: org.apache.spark.sql.SparkSession,
                         und0: Array[(Long, Long)], k: Int,
                         maxIter: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    var und = und0
    def degrees(e: Array[(Long, Long)]): Map[Long, Long] =
      (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.length.toLong }
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val bad = degrees(und).filter(_._2 < k).keySet
      if (bad.isEmpty) converged = true
      else {
        und = und.filter(e => !bad(e._1) && !bad(e._2))
        it += 1
      }
    }
    require(converged, s"kCore: no fixpoint within $maxIter peel rounds " +
      "(pathological chain graph? raise maxIter)")
    localResult(sess,
      degrees(und).toSeq.map { case (n, d) => Row(n, d) },
      StructType(Seq(StructField("node", LongType),
        StructField("deg", LongType))))
  }

  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    localEdges(und0) match {
      case Some(collected) =>
        return trianglesLocal(edges.sparkSession, collected)
      case None => // fall through to the distributed solve
    }
    val und = und0.cache()
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

  /** Driver-local [[triangles]]: each triangle x<y<z counted once at its
    * (x, y) edge via sorted-adjacency intersection with c > y — the same
    * count the degree-oriented distributed join produces (orientation
    * changes join geometry, never the count). Pure integer arithmetic. */
  private def trianglesLocal(sess: org.apache.spark.sql.SparkSession,
                             und: Array[(Long, Long)]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val adj = (und.map(e => e._1 -> e._2) ++ und.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    var tri = 0L
    und.foreach { case (a, b) => // canonical a < b
      val (small, large) =
        if (adj(a).size <= adj(b).size) (adj(a), adj(b)) else (adj(b), adj(a))
      small.foreach { c => if (c > b && large(c)) tri += 1 }
    }
    localResult(sess, Seq(Row(tri, und.length.toLong)),
      StructType(Seq(StructField("n_triangles", LongType),
        StructField("n_edges", LongType))))
  }

  /** Collected long-keyed seed nodes under the same local gate as
    * [[localEdges]]; None ⟹ distribute. Pure integer node ids, so the
    * only parity requirement is the set itself. */
  private def localSeeds(s0: DataFrame): Option[Array[Long]] = {
    val sess = s0.sparkSession
    val localMax = sess.conf
      .get("spark.graft.linkgraph.localMax", "100000").toLong
    if (localMax <= 0 ||
      s0.schema.fields.head.dataType !=
        org.apache.spark.sql.types.LongType) return None
    val probe = s0.limit(math.min(localMax,
      Int.MaxValue - 2L).toInt + 1).collect()
    if (probe.length > localMax) None
    else Some(probe.map(_.getLong(0)))
  }

  /** Minimum-hop BFS labels from a seed set after exactly `rounds`
    * frontier expansions over a DIRECTED edge table (pass the
    * symmetrized frame for undirected semantics): (node, hops), seeds at
    * hop 0, a node's label is the first round that reached it; nodes not
    * reached within `rounds` are absent. Pure integer labels — the two
    * paths below are trivially bit-identical (LinkGraphSpec pins it).
    *
    * Distributed shape: per round, ONE frontier×edges equi-join +
    * distinct + one anti-join against the visited set, localCheckpoint
    * truncating lineage (the CC discipline). Below the
    * `spark.graft.linkgraph.localMax` edge gate the walk runs on the
    * driver over the collected adjacency (the pageRank/HITS/CC
    * localMax discipline): K × (join + distinct + anti-join + two
    * materializations) of stage scheduling for microseconds of set
    * arithmetic. */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: DataFrame, seedCol: String, rounds: Int): DataFrame = {
    require(rounds >= 0, "bfsHops needs a non-negative round count")
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("from"), col(dstCol).as("to")).distinct()
    val s0 = seeds.filter(col(seedCol).isNotNull)
      .select(col(seedCol).as("node")).distinct()
    (localEdges(e0), localSeeds(s0)) match {
      case (Some(es), Some(sd)) =>
        return bfsHopsLocal(edges.sparkSession, es, sd, rounds)
      case _ => // distribute
    }
    val e = e0.cache()
    var visited = s0.withColumn("hops", lit(0L)).localCheckpoint()
    var frontier = visited
    (1 to rounds).foreach { k =>
      frontier = frontier
        .join(e.select(col("from").as("node"), col("to")), Seq("node"))
        .select(col("to").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), lit(k.toLong).as("hops"))
        .localCheckpoint()
      visited = visited.unionByName(frontier).localCheckpoint()
    }
    e.unpersist()
    visited
  }

  /** Driver-local [[bfsHops]] — the identical round structure over the
    * collected adjacency. */
  private def bfsHopsLocal(sess: org.apache.spark.sql.SparkSession,
                           edges: Array[(Long, Long)], seeds: Array[Long],
                           rounds: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val hops = new scala.collection.mutable.HashMap[Long, Long]()
    seeds.foreach(hops(_) = 0L)
    var frontier: Array[Long] = seeds
    var k = 1L
    while (k <= rounds && frontier.nonEmpty) {
      frontier = frontier.flatMap(adj.getOrElse(_, Array.empty[Long]))
        .distinct.filterNot(hops.contains)
      frontier.foreach(hops(_) = k)
      k += 1
    }
    localResult(sess,
      hops.toSeq.sortBy(_._1).map { case (n, h) => Row(n, h) },
      StructType(Seq(StructField("node", LongType),
        StructField("hops", LongType))))
  }

  /** Shortest-path distances from a seed set after exactly `rounds`
    * Bellman-Ford relaxations over a DIRECTED weighted edge table:
    * (node, dist) with dist = the minimum total weight over walks of at
    * most `rounds` edges (seeds at 0); unreached nodes are absent.
    * Integer weights only — exact arithmetic on both paths, so the
    * driver-local gate below `spark.graft.linkgraph.localMax` edges is
    * bit-identical to the distributed solve (LinkGraphSpec pins it).
    * Duplicate (from, to, w) edges collapse; the caller owns weight
    * determinism for (from, to) duplicates with conflicting weights
    * (both paths then relax over the same distinct triple set).
    *
    * Distributed shape: per round, ONE dist×edges equi-join + a
    * min-groupBy over the union with the previous front,
    * localCheckpoint truncating lineage. */
  def sssp(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
           seeds: DataFrame, seedCol: String, rounds: Int): DataFrame = {
    require(rounds >= 0, "sssp needs a non-negative round count")
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(wCol).isNotNull)
      .select(col(srcCol).as("from"), col(dstCol).as("to"),
        col(wCol).as("w")).distinct()
    val s0 = seeds.filter(col(seedCol).isNotNull)
      .select(col(seedCol).as("node")).distinct()
    // probe the TRIPLE frame directly so the gate probe IS the fetch
    // (mirrors localEdges/localSeeds) — the earlier form probed a
    // 2-col projection, discarded it, and re-executed the full distinct
    // lineage via e0.collect() (r17 ADVICE)
    val weighted = localTriples(e0)
    (weighted, localSeeds(s0)) match {
      case (Some(es), Some(sd)) =>
        return ssspLocal(edges.sparkSession, es, sd, rounds)
      case _ => // distribute
    }
    val e = e0.cache()
    var dist = s0.withColumn("dist", lit(0L)).localCheckpoint()
    (1 to rounds).foreach { _ =>
      val relaxed = dist
        .join(e.select(col("from").as("node"), col("to"), col("w")),
          Seq("node"))
        .select(col("to").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    e.unpersist()
    dist
  }

  /** Driver-local [[sssp]] — the identical relaxation rounds over the
    * collected weighted adjacency; exact longs, so min-fold order is
    * immaterial. */
  private def ssspLocal(sess: org.apache.spark.sql.SparkSession,
                        edges: Array[(Long, Long, Long)],
                        seeds: Array[Long], rounds: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val adj = edges.groupBy(_._1)
      .map { case (s, es) => s -> es.map(e => (e._2, e._3)) }
    var dist: Map[Long, Long] = seeds.map(_ -> 0L).toMap
    var k = 0
    while (k < rounds) {
      val next = scala.collection.mutable.HashMap[Long, Long](dist.toSeq: _*)
      dist.foreach { case (n, d) =>
        adj.getOrElse(n, Array.empty[(Long, Long)]).foreach { case (t, w) =>
          val nd = d + w
          if (nd < next.getOrElse(t, Long.MaxValue)) next(t) = nd
        }
      }
      dist = next.toMap
      k += 1
    }
    localResult(sess,
      dist.toSeq.sortBy(_._1).map { case (n, d) => Row(n, d) },
      StructType(Seq(StructField("node", LongType),
        StructField("dist", LongType))))
  }
}
