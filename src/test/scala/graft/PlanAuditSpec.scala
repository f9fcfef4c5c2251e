package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide physical-plan guard: no query may contain a cartesian or
  * broadcast-nested-loop join unless it is on the documented allowlist —
  * the plan-shape regression a single bad refactor (a dropped join key, a
  * non-equi condition) would otherwise introduce silently. Plans are built
  * at sf0.001; queries whose operators execute jobs at plan-build time
  * (Categorify fit, CC rounds, IVF fit) run them at that scale, which
  * keeps the whole audit cheap.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose cross/NLJ is a documented design choice:
    *   - q16: the exact all-pairs ground-truth harness (its point).
    *   - q19/q56: bounded query batch BROADCAST against the corpus scan —
    *     a broadcast NLJ over a ~125-row side, the intended exact baseline.
    *   - q34: below the size gate (10⁴ docs) the all-pairs plan IS the
    *     chosen physical plan; above it DedupSpec asserts cross-free.
    *   - q59: a broadcast scalar (corpus doc count) joined into every row.
    *   - q81: q19's bounded-broadcast exact baseline, quantized domain.
    *   - q79/q97: UnigramLm.fit joins a one-row broadcast aggregate (the
    *     token-count denominator) onto the top-K vocab — the lazy-total
    *     shape that lets ReuseExchange tokenize the corpus once.
    *   - q98: fit's scalar total plus qualityBuckets' one-row broadcast
    *     tercile cuts joined onto every scored row.
    *   - q100: routeByClass completes the doc x class score grid with a
    *     broadcast cross of the class list (K rows, K = #classes) so
    *     zero-hit classes score 0.0; plus fitClassVocab's class-total
    *     broadcast.
    *   - q102: the G-row per-group size table (G = #groups) broadcast-
    *     crossed with itself so zero-intersection pairs stay in the
    *     overlap matrix.
    *   - q105: two UnigramLm.fits, each with the one-row broadcast total
    *     (the q79 lazy-denominator shape).
    *   - q88: coverageVocab's one-row broadcast token-mass total (same
    *     lazy-denominator shape as q79 — replaced the eager head() that
    *     tokenized the corpus twice).
    *   - q118: sparseCosineTopK's one-row broadcast corpus count (the
    *     q59 idf denominator as a lazy scalar — same shape as q79/q88).
    *   - q122: the probe terms (6 literal rows) broadcast-crossed with
    *     the ONE-ROW Count-Min sketch aggregate — both sides are
    *     driver-scale by construction.
    *   - q135: three ONE-ROW frames crossed (corpus-A sketch × corpus-B
    *     sketch × the exact-counts aggregate) — each side a single-row
    *     aggregate of bounded width (two 256-long bottom-k arrays and
    *     two counters); the set-operation arithmetic runs on that one
    *     joined row.
    *   - q141: the G-row per-source sketch table inequality-joined with
    *     itself to form the pair grid (G = #sources — q102's exact
    *     overlap matrix has the same allowlisted G×G shape; here each
    *     row additionally carries a k-long bottom-k array).
    *   - q160: ppsSample's ONE-ROW broadcast total-weight frame crossed
    *     into the cumsum (the q79/q88/q118 lazy-denominator shape — the
    *     stride arithmetic needs the global total on every row).
    *   - q149/q150/q151: the merged-sketch rollup queries each cross a
    *     ONE-ROW aggregate into the result (q149: the exact-distinct
    *     rider onto the one-row merged-mins frame; q150: the global
    *     exact-distinct rider onto the merged-register row; q151: the
    *     6 literal probe terms against the ONE-ROW merged counter
    *     array — q122's exact shape).
    *   - q188: two ONE-ROW sketch aggregates crossed with the ONE-ROW
    *     exact-count frame (the q135 three-one-row-frames shape — the
    *     CMS dot product runs on that single joined row).
    *   - q190/q197: a ONE-ROW denominator aggregate crossed into the
    *     result (q190: the distinct-order count onto the pair table;
    *     q197: each FK edge's one-row totals × one-row orphan count —
    *     the q79/q88/q118 lazy-denominator shape).
    *   - q212: the ONE-ROW corpus-split totals crossed onto the
    *     per-token count table (χ² needs N_a/N_b on every row — the
    *     q79 lazy-denominator shape again).
    *   - q221: the ONE-ROW session count crossed onto the pair table
    *     (the q190 support denominator at session grain).
    *   - q227: two ONE-ROW frames crossed twice (side-A sketch × side-B
    *     sketch, then the histKs row × the ONE-ROW exact-KS rider) —
    *     the q135/q188 bounded-width one-row-aggregate shape.
    *   - q231: the ONE-ROW anchor-date aggregate broadcast-crossed onto
    *     the per-customer frame (recency needs the global max date on
    *     every row — the q79 lazy-denominator shape).
    *   - q233: the zero-fill grid crosses the distinct TYPE list with
    *     the day-span sequence — both sides domain-bounded (types ×
    *     days), the point being that lag-7 must see explicit zero days.
    *   - q239: q19's bounded-broadcast shape over the PQ-ENCODED corpus
    *     (the scored side carries m codes, not vectors) — the query
    *     batch broadcasts, the qid≠nid predicate makes it an NLJ by
    *     form, and the corpus scan stays embarrassingly parallel.
    *   - q244: the DENSE stage is exactly q19's bounded-broadcast exact
    *     baseline (the RRF fusion itself is equi-joins and partitioned
    *     windows; at scale the dense ranks swap to annTopK/IvfIndex,
    *     documented in the query).
    *   - q246: the ONE-ROW observation-end aggregate broadcast-crossed
    *     onto the per-user lifetime frame (every user's churn cut needs
    *     the global max timestamp — the q231 anchor-date shape).
    *   - q248: the candidate stage is q19's bounded-broadcast baseline;
    *     the MMR rounds themselves are candidate-set-local equi-joins.
    *   - q251: the ONE-ROW N/B token totals broadcast-crossed onto the
    *     bigram table (the q190 support-denominator shape).
    *   - q253: the per-stage ledger rows are ONE-ROW count aggregates
    *     crossed together (q190 shape); the pair stage itself is pinned
    *     to the prefix-index plan (allPairsMax = 0), never a crossJoin.
    *   - q263: the candidate stage is q19's bounded-broadcast exact
    *     baseline (the NDCG/MRR scoring tail is per-query arithmetic
    *     over k rows; at scale the candidates swap to annTopK/IVFPQ,
    *     documented in the query).
    *   - q271: the same q19/q263 candidate stage; the hard-example
    *     windows ride the queries×k rows.
    *   - q274: four ONE-ROW summary aggregates crossed into the
    *     single-row report (the q135/q188 bounded-width shape); the
    *     pair stages themselves are basket/list equi-joins.
    *   - q283: the q19/q263 candidate stage again; voting and the
    *     confusion grid are |labels|-bounded.
    */
  private val allowed = Set(
    "q16_ngram_jaccard", "q19_cosine_topk", "q56_cosine_neardup",
    "q34_dedup_groups", "q59_tfidf", "q81_quantized_topk",
    "q79_unigram_lm", "q97_dsir_select", "q98_ccnet_buckets",
    "q100_class_route", "q102_source_overlap", "q105_vocab_drift",
    "q88_vocab_coverage", "q118_sparse_topk", "q122_cms_counts",
    "q135_kmv_overlap", "q141_kmv_matrix", "q160_pps_sample",
    "q149_kmv_merge", "q150_hll_merge", "q151_cms_merge",
    "q188_cms_join_est", "q190_assoc_rules", "q197_ref_integrity",
    "q212_keyness", "q221_session_basket", "q227_ks_hist",
    "q231_rfm", "q233_backtest", "q239_pq_topk", "q244_rrf_hybrid",
    "q246_hazard", "q248_mmr_rerank", "q251_collocations",
    "q253_dedup_cascade", "q263_retrieval_eval", "q271_hard_mining",
    "q274_rec_eval", "q283_knn_eval")

  test("no undocumented cartesian/broadcast-NLJ in any query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan
          .toString.toLowerCase
        val hasCross =
          plan.contains("cartesianproduct") || plan.contains("broadcastnestedloop")
        if (hasCross && !allowed(name)) Some(name)
        else if (!hasCross && allowed(name)) None // allowlist is permissive,
          // not required: a query may lose its NLJ (e.g. q34 above-gate)
        else None
    }
    assert(offenders.isEmpty,
      s"undocumented cross/NLJ joins in: ${offenders.mkString(", ")}")
  }
}
