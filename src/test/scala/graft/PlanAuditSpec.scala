package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide physical-plan guards, one plan build per query (sf0.001;
  * queries whose operators execute jobs at plan-build time — Categorify
  * fit, CC rounds, IVF fit — run them at that scale, keeping the audit
  * cheap):
  *
  *   1. no cartesian / broadcast-nested-loop join off the documented
  *      allowlist — the plan-shape regression a single bad refactor (a
  *      dropped join key, a non-equi condition) introduces silently;
  *   2. no planner-inserted `Exchange SinglePartition,
  *      ENSURE_REQUIREMENTS` off the documented-BOUND allowlist — the
  *      q193-class pathology (a fact-table window/sort serialized onto
  *      one task) that previously took a manual PLANS.md sweep every
  *      round to adjudicate. The matcher is deliberately narrow: the
  *      `.ordered(...)` output contract's `repartition(1)` prints as
  *      REPARTITION_BY_NUM (a deliberate, documented one-partition dump
  *      of an already-small result) and is NOT flagged; only exchanges
  *      the PLANNER inserted to satisfy an AllTuples/single-partition
  *      requirement are audited, because those are where an unbounded
  *      frame can silently serialize.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** One executedPlan string per query, built once and shared by every
    * audit in this suite (the build itself is the expensive part).
    * The bench-only production twins (`prodVariants`) are swept with the
    * same rules — round 16's gap was exactly that the most expensive
    * bench item (q248__prod) sat outside the cartesian/SinglePartition
    * guard because the sweep read only `queries`. */
  private lazy val plans: Seq[(String, String)] =
    (SparkEntry.queries.toSeq ++ SparkEntry.prodVariants.toSeq)
      .sortBy(_._1).map { case (name, fn) =>
        name -> fn(spark, dir).queryExecution.executedPlan.toString
      }

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
    *   - (q100 left this list in round 17: the promoted merged router
    *     scores via ONE broadcast equi-join on the token — the class-list
    *     cross belonged to the demoted grid+window sibling, and the
    *     fitClassVocab subtree is collected at plan-build time.)
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
    "q102_source_overlap", "q105_vocab_drift",
    "q88_vocab_coverage", "q118_sparse_topk", "q122_cms_counts",
    "q135_kmv_overlap", "q141_kmv_matrix", "q160_pps_sample",
    "q149_kmv_merge", "q150_hll_merge", "q151_cms_merge",
    "q188_cms_join_est", "q190_assoc_rules", "q197_ref_integrity",
    "q212_keyness", "q221_session_basket", "q227_ks_hist",
    "q231_rfm", "q233_backtest", "q239_pq_topk", "q244_rrf_hybrid",
    "q246_hazard", "q248_mmr_rerank", "q251_collocations",
    "q253_dedup_cascade", "q263_retrieval_eval", "q271_hard_mining",
    "q274_rec_eval", "q283_knn_eval",
    // q288: the ONE-ROW leakage-audit aggregate (n_users, n_user_splits)
    //   crossed onto the 3-row split frame (the q190 lazy-denominator
    //   shape); q289: the ONE-ROW max-item domain aggregate crossed onto
    //   the user frame before the hash draw (same shape).
    "q288_group_split", "q289_negative_sampling",
    // q298: the EXACT leg of the recall tripwire is q19's bounded-
    //   broadcast brute-force baseline over the %100 query sample —
    //   deliberately the one place the brute force belongs (recall
    //   estimation needs ground truth on a sample); the approx leg is
    //   the equi-join budgeted probe.
    "q298_recall_tripwire",
    // q122__prod: the xxh64 hash-mode twin of q122 — identical shape
    //   (6 literal probe rows crossed with the ONE-ROW CMS aggregate).
    //   Notably the OTHER prod twins are cross-free: the q244/q248
    //   IVFPQ candidate stages are equi-joins (cell probe + code join),
    //   which is exactly why they scale where the siblings' broadcast
    //   NLJ baselines don't.
    "q122_cms_counts__prod")

  test("no undocumented cartesian/broadcast-NLJ in any query plan") {
    val offenders = plans.flatMap { case (name, planStr) =>
      val plan = planStr.toLowerCase
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

  // ---- single-partition exchange audit ---------------------------------

  /** Planner-inserted single-partition exchanges in a physical plan
    * string. REPARTITION_BY_NUM (the `.ordered` output dump) is excluded
    * by construction — only ENSURE_REQUIREMENTS placements are the
    * planner satisfying a one-partition distribution requirement. */
  private[graft] def singlePartitionExchanges(plan: String): Int =
    "Exchange SinglePartition, ENSURE_REQUIREMENTS".r
      .findAllMatchIn(plan).length

  /** Every query that legitimately carries a planner-inserted
    * single-partition exchange, WITH the bound that makes it safe: the
    * frame crossing the exchange is sized by a DOMAIN (grid cells,
    * sketch width, decile/fold/class counts, one-row aggregates), never
    * by the fact table. A query absent from this map that grows one is
    * the q193 pathology and fails the audit until its bound is named
    * here (or the plan is fixed — PrefixSum owns the global-order
    * monoids, runningMaxStrictAsc the running-max family). */
  private val boundedSinglePartition: Map[String, String] = Map(
    "q06_categorify" -> "per-column vocab count frames (|vocab| rows)",
    "q11_vocab_stats" -> "one-row distinct-counts aggregate",
    "q40_vocab_sketch" -> "one-row sketch aggregate",
    "q43_scalar_subquery" -> "one-row scalar-subquery aggregate",
    "q59_tfidf" -> "one-row corpus doc-count aggregate",
    "q79_unigram_lm" -> "one-row token-total aggregate (lazy denominator)",
    "q88_vocab_coverage" -> "one-row token-mass total",
    "q97_dsir_select" -> "one-row totals of the two unigram LMs",
    "q98_ccnet_buckets" -> "one-row total + 3-row tercile cuts",
    "q105_vocab_drift" -> "top-K vocab frames (K rows per corpus)",
    "q118_sparse_topk" -> "one-row corpus-count aggregate",
    "q122_cms_counts" -> "one-row Count-Min sketch aggregate",
    "q130_hll_distinct" -> "one-row HLL register aggregate",
    "q135_kmv_overlap" -> "one-row KMV sketch aggregates",
    "q137_dq_checks" -> "one-row publish-gate check aggregate",
    "q148_hist_merge" -> "one-row merged fixed-width histogram",
    "q149_kmv_merge" -> "one-row merged KMV sketch",
    "q150_hll_merge" -> "one-row merged HLL registers",
    "q151_cms_merge" -> "one-row merged CMS counters",
    "q160_pps_sample" -> "one-row total-weight frame + 20k advisor sample",
    "q164_sketch_mv" -> "per-day sketch rows (day-domain grid)",
    "q176_funnel" -> "stage-domain funnel grid (|stages| rows)",
    "q180_benford" -> "9-row leading-digit grid",
    "q184_ab_test" -> "per-arm aggregate grid (|arms| rows)",
    "q187_fd_audit" -> "per-FD-edge one-row violation aggregates",
    "q188_cms_join_est" -> "one-row sketch aggregates",
    "q190_assoc_rules" -> "one-row distinct-order denominator",
    "q192_gini" -> "decile-domain grid (10 rows)",
    "q197_ref_integrity" -> "per-FK-edge one-row audit aggregates",
    "q200_cramers_v" -> "bounded contingency grid (|a|x|b| cells)",
    "q201_date_dim" -> "day-span sequence (date-domain grid)",
    "q202_cuped" -> "one-row covariance/variance aggregates",
    "q205_sliding_hll" -> "per-day HLL rows (day-domain grid)",
    "q211_forget_scrub" -> "one-row scrub ledger aggregate",
    "q212_keyness" -> "one-row corpus-split token totals",
    "q220_apportionment" -> "fixed seat-ladder grid (seats x parties)",
    "q221_session_basket" -> "one-row session-count denominator",
    "q224_ks_drift" -> "quantized value-domain CDF grid",
    "q227_ks_hist" -> "one-row sketch + 256-bin histogram grid",
    "q231_rfm" -> "PrefixSum bucket ledger (<= nB boundary rows)",
    "q232_key_skew" -> "top-K key frame (K rows)",
    "q233_backtest" -> "(type x day) domain grid",
    "q245_phrase_search" -> "per-phrase candidate/rank frames (|phrases| bounded)",
    "q246_hazard" -> "one-row observation-end aggregate",
    "q251_collocations" -> "one-row N/B token totals",
    "q253_dedup_cascade" -> "per-stage one-row ledger aggregates",
    "q259_calibration" -> "score-bin calibration grid",
    "q260_bin_drift" -> "score-bin drift grid",
    "q261_gains" -> "decile-domain gains grid",
    "q262_gini_gain" -> "(feature x class) split grid",
    "q267_path_trigrams" -> "page-domain trigram grid (125 rows)",
    "q269_ips_offpolicy" -> "(ctx x action) cell grid (~20 rows)",
    "q270_cv_folds" -> "fold x score-domain grid",
    "q274_rec_eval" -> "one-row summary aggregates over top-5 lists",
    "q278_decayed_popularity" -> "(type x day) grid + one-row score total",
    "q279_uplift_qini" -> "decile-domain uplift grid",
    "q285_itemcf_cap_ledger" -> "one-row basket-census ledger rollup",
    "q288_group_split" -> "one-row leakage-audit aggregate (2 counters)",
    "q289_negative_sampling" -> "one-row max-item domain aggregate",
    "q40_vocab_sketch__prod" -> "one-row sketch aggregate (q40's shape)",
    "q122_cms_counts__prod" -> "one-row Count-Min sketch aggregate (q122's shape)")

  test("every planner-inserted SinglePartition exchange has a named bound") {
    val offenders = plans.flatMap { case (name, plan) =>
      val n = singlePartitionExchanges(plan)
      if (n > 0 && !boundedSinglePartition.contains(name)) Some(s"$name ($n)")
      else None // allowlist is permissive, not required: a query may lose
        // its exchange (e.g. a broadcast flip at a different SF)
    }
    assert(offenders.isEmpty,
      "planner-inserted single-partition exchanges with NO documented bound " +
        s"(name the bound in boundedSinglePartition or fix the plan): " +
        offenders.mkString(", "))
  }

  test("the audit is red on a planted global-window query (not vacuous)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the exact q193-class shape: a window over EVERYTHING — the planner
    // must serialize the full frame onto one task to satisfy it
    val planted = spark.range(1000)
      .withColumn("rn", row_number().over(Window.orderBy(col("id"))))
      .queryExecution.executedPlan.toString
    assert(singlePartitionExchanges(planted) > 0,
      "detector failed to see the planted single-partition window")
    // and an unlisted query carrying it WOULD be flagged by the audit rule
    val flagged = singlePartitionExchanges(planted) > 0 &&
      !boundedSinglePartition.contains("q999_planted")
    assert(flagged)
  }
}
