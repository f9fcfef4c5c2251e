package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, Sketches}
import graft.sources.Tables

/** Row-set equivalence between the bench-only production-path twins
  * (`SparkEntry.prodVariants` — xxh64/murmur3 hash modes, forced prefix
  * plan) and their oracle-checked md5-mode siblings. The twins are
  * deliberately NOT oracle rows (their hashes aren't DuckDB-expressible);
  * this spec is the committed gate that a prod-path refactor cannot
  * silently diverge from the verified sibling:
  *
  *  - exact operators (q34 prefix-vs-gated) must match ROW FOR ROW;
  *  - verified-candidate operators (q17 LSH, q18 simhash) may differ in
  *    which candidates their hash surfaces, but every emitted pair must
  *    carry the hash-independent exact score, sit inside the exact
  *    ground truth where one exists, and mutually recall the sibling's
  *    pair set within the planted-fixture bound;
  *  - estimators (q40 KMV, q122 CMS) must agree on every exact column
  *    and keep both hash modes' estimates inside the sketch's error
  *    bound around the same exact values.
  *
  * Everything is deterministic: fixed fixtures, fixed seeds, fixed hash
  * modes — the bounds either hold forever or a refactor broke them. */
class VariantEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q34__prefix twin equals the gated sibling row for row (exact op)") {
    val twin = SparkEntry.prodVariants("q34_dedup_groups__prefix")(spark, sf)
      .as[(Long, Long)].collect().toSet
    val sibling = SparkEntry.queries("q34_dedup_groups")(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(twin === sibling,
      s"prefix plan diverged from the gated plan: " +
        s"only-twin=${(twin -- sibling).take(5)} " +
        s"only-sibling=${(sibling -- twin).take(5)}")
  }

  test("q100 primary (merged router) equals the demoted grid+window " +
      "sibling row for row") {
    // exact operator: since round 17 the merged single-pass router IS
    // q100's primary (oracle-checked) path; the K-cross grid+window form
    // it replaced is rebuilt here as the equivalence oracle — every
    // route, token count, mass, and tie-break must match bit for bit
    // (masses are 1e-6-grid doubles, so Set equality is well-defined)
    import graft.llm.UnigramLm
    import graft.sources.Tables
    val docs = Tables(spark, sf, "documents").filter(col("text").isNotNull)
    val model = UnigramLm.fitClassVocab(docs, "source", "text",
      vocabSize = 20)
    val sibling = UnigramLm.routeByClass(docs, "doc_id", "text", model)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("pred_cls"), col("n_tokens"), col("mass"),
        (col("pred_cls") === col("source")).cast("long").as("self_routed"))
      .as[(Long, String, Long, Double, Long)].collect().toSet
    val primary = SparkEntry.queries("q100_class_route")(spark, sf)
      .as[(Long, String, Long, Double, Long)].collect().toSet
    assert(primary.nonEmpty, "router produced no rows")
    assert(primary === sibling,
      s"merged primary diverged from the grid+window sibling: " +
        s"only-primary=${(primary -- sibling).take(5)} " +
        s"only-sibling=${(sibling -- primary).take(5)}")
  }

  test("q17 LSH twin (murmur3) is plausibility-matched to the md5 sibling") {
    def pairs(mode: String): Map[(Long, Long), Double] =
      Dedup.minhashLsh(Tables(spark, sf, "documents"), "doc_id", "text",
          shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.6,
          hashMode = mode)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
    val md5 = pairs("md5")
    val prod = pairs("murmur3")
    // ground truth: the exact all-pairs Jaccard at the same threshold —
    // both hash modes verify candidates exactly, so both are subsets
    val truth = Dedup.ngramJaccardPairs(
        Tables(spark, sf, "documents").filter(col("text").isNotNull),
        "doc_id", "text", shingleK = 3, threshold = 0.6)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    for ((name, got) <- Seq("md5" -> md5, "murmur3" -> prod)) {
      assert(got.keySet.subsetOf(truth.keySet),
        s"$name emitted non-qualifying pairs: ${(got.keySet -- truth.keySet).take(5)}")
      // the jaccard column is hash-independent exact arithmetic
      got.foreach { case (p, j) => assert(j === truth(p),
        s"$name pair $p scored $j, exact is ${truth(p)}") }
    }
    // mutual recall: the fixture's qualifying pairs are high-similarity
    // near-dups (detection prob per band row ~J^4 over 8 bands), so each
    // mode must surface the bulk of what the other does
    val inter = (md5.keySet & prod.keySet).size.toDouble
    val bigger = math.max(md5.size, prod.size).toDouble
    assert(bigger > 0, "fixture must plant qualifying near-dup pairs")
    assert(inter / bigger >= 0.8,
      s"LSH modes diverged: md5=${md5.size} murmur3=${prod.size} " +
        s"common=${inter.toInt}")
  }

  test("q18 simhash twin (xxh64) is plausibility-matched to the md5 sibling") {
    // Simhash's pair set at a nonzero radius is legitimately
    // hash-DEPENDENT for borderline-similarity pairs (each mode draws a
    // different random projection), so a raw cross-mode overlap bound
    // would assert something the operator never promised. What IS
    // invariant, and what this gate pins per mode:
    //  1. bag-equality ⟹ hamming 0 under ANY mode (identical lowercase
    //     token multisets hash identically), so both modes' zero sets
    //     must CONTAIN the hash-independent fingerprint ground truth
    //     (not equal it: a near-dup whose differing tokens leave every
    //     bit-sum's sign unchanged also lands at hamming 0, and which
    //     ones do is mode-dependent);
    //  2. a ONE-TOKEN perturbation of a real doc flips only the bits
    //     that token's hash touches — planted perturbed twins must be
    //     recalled at radius 6 by BOTH modes.
    val docs = Tables(spark, sf, "documents")
      .filter(col("text").isNotNull && col("doc_id").isNotNull)
    // the corpus plants both structures over REAL fixture text:
    // token-PERMUTED copies (+2·10⁷ — reversed token order, same
    // multiset → bag-equal, hamming 0 under any hash) and one-token
    // perturbations (+10⁷)
    val sample = docs.orderBy(col("doc_id")).limit(40)
      .select("doc_id", "text").persist()
    val permuted = sample
      .select((col("doc_id") + 20000000L).as("doc_id"),
        array_join(reverse(split(col("text"), " ")), " ").as("text"))
    val perturbed = sample
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" zq7perturb")).as("text"))
    val corpus = docs.select("doc_id", "text")
      .unionByName(permuted).unionByName(perturbed)
    val bagTruth = corpus
      .select(col("doc_id"), graft.llm.TextStats.fingerprint(col("text"))
        .as("fp"))
      .as[(Long, String)].collect().groupBy(_._2).values
      .flatMap { g =>
        val ids = g.map(_._1).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    def zeroPairs(mode: String): Set[(Long, Long)] =
      Dedup.simhashBandedPairs(corpus, "doc_id", "text", radius = 6,
          hashMode = mode)
        .filter(col("hamming") === 0L)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bagTruth.nonEmpty, "corpus must plant bag-equal duplicates")
    for (mode <- Seq("md5", "xxh64")) {
      val zero = zeroPairs(mode)
      assert(bagTruth.subsetOf(zero),
        s"$mode hamming-0 pairs must contain every bag-equal pair; " +
          s"missing=${(bagTruth -- zero).take(5)}")
    }
    val plantedPairs = sample
      .select(col("doc_id")).as[Long].collect()
      .map(d => (d, d + 10000000L)).toSet
    sample.unpersist()
    for (mode <- Seq("md5", "xxh64")) {
      val got = Dedup.simhashBandedPairs(corpus, "doc_id", "text",
          radius = 6, hashMode = mode)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val recalled = plantedPairs.count(got.contains).toDouble
      assert(recalled / plantedPairs.size >= 0.9,
        s"$mode recalled only $recalled/${plantedPairs.size} planted " +
          "one-token perturbations at radius 6")
    }
  }

  test("q40 KMV twin (xxh64) brackets the same exact counts as the md5 sibling") {
    val li = Tables(spark, sf, "lineitem")
    val exact = li.agg(
        countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long)].head()
    def est(mode: String): (Double, Double, Long) =
      li.agg(
          Sketches.kmvDistinct(col("l_orderkey"), 256, mode).as("a"),
          Sketches.kmvDistinct(col("l_partkey"), 256, mode).as("b"),
          count(lit(1)).as("n"))
        .as[(Double, Double, Long)].head()
    val m = est("md5")
    val x = est("xxh64")
    assert(m._3 === exact._3 && x._3 === exact._3,
      "n_rows is exact and hash-independent")
    // KMV k=256: relative std err ~1/sqrt(k-2) ≈ 6.3%; 4σ = 25% is a
    // deterministic-once-fixed bound with wide margin
    def within(estv: Double, ex: Long): Boolean =
      math.abs(estv - ex) <= 0.25 * ex
    for ((name, e) <- Seq("md5" -> m, "xxh64" -> x)) {
      assert(within(e._1, exact._1),
        s"$name n_orders_est ${e._1} vs exact ${exact._1}")
      assert(within(e._2, exact._2),
        s"$name n_parts_est ${e._2} vs exact ${exact._2}")
    }
  }

  test("q122 CMS twin (xxh64) upper-bounds the same exact counts as md5") {
    def run(q: String): Map[String, (Long, Long)] =
      (if (q.endsWith("__prod")) SparkEntry.prodVariants(q)
       else SparkEntry.queries(q))(spark, sf)
        .as[(String, Long, Long)].collect()
        .map { case (t, e, n) => t -> ((e, n)) }.toMap
    val md5 = run("q122_cms_counts")
    val prod = run("q122_cms_counts__prod")
    assert(md5.keySet === prod.keySet, "probe terms are fixed")
    val total = Tables(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select(explode(graft.llm.TextStats.tokens(lower(col("text")))))
      .count()
    md5.keySet.foreach { t =>
      val (em, nm) = md5(t)
      val (ep, np) = prod(t)
      assert(nm === np, s"$t: exact counts must be hash-independent")
      // CMS guarantee per row: est >= exact; est <= exact + eps·N w.h.p.
      // (eps ~ 2/width) — with min over depth rows, 4/width·N is wide
      assert(em >= nm && ep >= nm, s"$t: CMS must never undercount")
      val slack = 4.0 * total / graft.SparkEntry.cmsW
      assert(em - nm <= slack && ep - nm <= slack,
        s"$t: overcount past the sketch bound (md5=$em prod=$ep exact=$nm)")
    }
  }

  // ---- IVFPQ production retrieval twins (q244/q248 __prod) -------------

  /** Mean recall of the IVFPQ candidate stage against the exact cosine
    * top-k — the q239 tripwire shape: data + seeds are fixed, so the
    * number either holds forever or a refactor broke the index/codes. */
  private def candidateRecall(k: Int): Double = {
    val emb = Tables(spark, sf, "embeddings")
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
    val exact = graft.llm.Similarity.cosineTopK(
        emb.filter(col("vec_id") % 20 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        emb.select(col("vec_id").as("nid"), col("embedding").as("nvec")),
        k = k)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = SparkEntry.ivfpqCandidates(spark, sf, k)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, want) =>
      approx.getOrElse(qid, Set.empty).intersect(want).size.toDouble /
        want.size
    }
    recalls.sum / recalls.size
  }

  test("q244__prod: IVFPQ candidate recall above the tripwire; fusion " +
      "tail identical to the sibling's") {
    val r = candidateRecall(20)
    // the floor is the regression tripwire — a broken codebook/probe
    // refactor lands near chance (~20/125 ≈ 0.16), a working one stays
    // well above (recall@10 measures 0.31; @20 is looser)
    assert(r >= 0.35, f"IVFPQ candidate recall@20 $r%.3f collapsed")
    val twin = SparkEntry.prodVariants("q244_rrf_hybrid__prod")(spark, sf)
    val sib = SparkEntry.queries("q244_rrf_hybrid")(spark, sf)
    // structure: every query answers with ranks 1..5, same query set
    val byQ = twin.select("qid", "rank").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val sibQ = sib.select("qid").as[Long].collect().toSet
    assert(byQ.keySet === sibQ)
    byQ.foreach { case (q, rs) => assert(rs === Seq(1L, 2L, 3L, 4L, 5L),
      s"query $q emitted ranks $rs") }
    // the LEXICAL leg is hash-free and shared: wherever twin and
    // sibling emit the same (qid, nid), the lexical rank must agree
    val sibRl = sib.select("qid", "nid", "rl")
      .as[(Long, Long, Option[Long])].collect()
      .map { case (q, n, rl) => (q, n) -> rl }.toMap
    val twinRl = twin.select("qid", "nid", "rl")
      .as[(Long, Long, Option[Long])].collect()
      .map { case (q, n, rl) => (q, n) -> rl }.toMap
    val sharedKeys = sibRl.keySet.intersect(twinRl.keySet)
    assert(sharedKeys.nonEmpty, "twin and sibling share no rows at all")
    sharedKeys.foreach { k =>
      assert(sibRl(k) === twinRl(k), s"lexical rank diverged at $k") }
  }

  test("q248__prod: candidate recall above the tripwire; greedy rounds " +
      "replay exactly over the twin's own candidates") {
    // measured 0.31 at sf0.001 (recall@10 is tighter than @20 — fewer
    // exact neighbors survive 4-bit ADC ranking); chance is ~10/124 ≈
    // 0.08, so 0.2 separates working from broken by 2.5×
    val r = candidateRecall(10)
    assert(r >= 0.2, f"IVFPQ candidate recall@10 $r%.3f collapsed")
    // independent replay of the MMR greedy over the twin's OWN candidate
    // frame: the rel/sim numerics come from the same engine expressions
    // (no float-parity gap to bridge), the SELECTION logic — argmax,
    // anti-join, 0.7·rel − 0.3·maxsim — is re-derived in plain Scala on
    // the collected queries×10 rows, so a broken round refactor cannot
    // hide behind low candidate overlap with the exact sibling
    val emb = Tables(spark, sf, "embeddings")
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
    val cands = SparkEntry.ivfpqCandidates(spark, sf, 10)
    val cv = cands.join(
      emb.select(col("vec_id").as("nid"), col("embedding").as("v")),
      Seq("nid"))
    val simRows = cv.select(col("qid"), col("nid").as("anid"),
        col("v").as("av"))
      .join(cv.select(col("qid"), col("nid").as("bnid"),
        col("v").as("bv")), Seq("qid"))
      .filter(col("anid") =!= col("bnid"))
      .select(col("qid"), col("anid"), col("bnid"),
        graft.llm.Similarity.round6(
          graft.llm.Similarity.dot(col("av"), col("bv")) /
          (graft.llm.Similarity.l2Norm(col("av")) *
            graft.llm.Similarity.l2Norm(col("bv")))).as("sim"))
      .as[(Long, Long, Long, Double)].collect()
      .map { case (q, a, b, s) => (q, a, b) -> s }.toMap
    val rel = cands.select("qid", "nid", "cos")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = rel.flatMap { case (q, cs) =>
      var picked = Vector.empty[(Long, Double)]
      (1 to 3).foreach { _ =>
        val avail = cs.filter(c => !picked.exists(_._1 == c._1))
        val scored = avail.map { case (n, rl) =>
          if (picked.isEmpty) n -> rl
          else n -> r6(0.7 * rl -
            0.3 * picked.map(p => simRows((q, n, p._1))).max)
        }
        if (scored.nonEmpty) {
          // argmax on (score DESC, nid ASC) — the engine's tie order
          val best = scored.toSeq.minBy { case (n, sc) => (-sc, n) }
          picked :+= best
        }
      }
      picked.zipWithIndex.map { case ((n, sc), i) =>
        (q, i + 1, n) -> sc }
    }
    val twin = SparkEntry.prodVariants("q248_mmr_rerank__prod")(spark, sf)
      .select("qid", "pick", "nid", "score")
      .as[(Long, Int, Long, Double)].collect()
      .map { case (q, p, n, sc) => (q, p.toLong, n) -> sc }.toMap
    assert(twin.keySet === expected.map { case ((q, p, n), _) =>
      (q, p.toLong, n) }.toSet,
      "twin pick set diverged from the independent greedy replay")
    expected.foreach { case ((q, p, n), sc) =>
      assert(twin((q, p.toLong, n)) === sc,
        s"score diverged at query $q pick $p") }
  }
}
