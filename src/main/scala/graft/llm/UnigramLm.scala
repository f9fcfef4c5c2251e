package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the perplexity-proxy quality signal a
  * training pipeline uses to rank "in-distribution-ness" of documents
  * against a reference corpus (the cheap tier below a real LM scorer;
  * same role, join-shaped and exact).
  *
  *  - [[fit]]: token histogram (one shuffle, map-side combined) -> top
  *    `vocabSize` types by frequency (deterministic tie-break) with
  *    maximum-likelihood probability p(w) = count(w)/total. The model is
  *    a driver-small DIMENSION TABLE, not per-doc state.
  *  - [[score]]: tokens left-join the vocabulary (broadcast — the model
  *    is vocab-sized), per-doc mean in-vocab probability plus OOV count.
  *    Out-of-vocabulary tokens contribute probability 0 — the score IS
  *    the in-distribution mass, so boilerplate scores high and
  *    gibberish/OOV-heavy text scores near 0.
  *
  * Cross-engine exactness (the q63/q74 technique): each token's
  * probability is floor-rounded to 1e-9 (exact in IEEE), summed as
  * DECIMAL (exact, order-free — a float sum would vary with Spark's
  * partition order and never match an external engine), and only the
  * final mean is a float op, floor-rounded to 1e-6. No logs anywhere: ln
  * is not bit-identical across engines (the q74 linear-idf lesson).
  */
object UnigramLm {

  /** Fit the vocabulary: (tok, p) for the top `vocabSize` types.
    * `total` counts ALL occurrences (including types cut by the limit),
    * so probabilities are true corpus MLE, not renormalized.
    *
    * Fully LAZY — one plan, no driver action: the denominator is a
    * one-row aggregate over the same token histogram, broadcast back
    * onto the top-K rows. Both consumers sit on the identical
    * scan→explode→partial-agg exchange, so ReuseExchange tokenizes the
    * corpus ONCE (an eager driver-side `total` — the earlier shape —
    * re-ran the whole tokenize a second time; at corpus scale the
    * explode IS the dominant cost). greatest(·, 1) absorbs the empty
    * corpus (sum is null, and the vocab is empty then anyway). */
  def fit(docs: DataFrame, text: String, vocabSize: Int): DataFrame = {
    val hist = docs
      .select(explode(TextStats.tokens(lower(col(text)))).as("tok"))
      .groupBy("tok").count()
    val total = hist.agg(
      greatest(sum("count"), lit(1L)).cast("double").as("__total"))
    hist.orderBy(desc("count"), asc("tok")).limit(vocabSize)
      .crossJoin(broadcast(total))
      .select(col("tok"), (col("count").cast("double") / col("__total")).as("p"))
  }

  /** Adjacent-pair "w1 w2" strings for a token array; [] for <2 tokens.
    * Built with zip_with over two slices — one codegen'd projection, no
    * explode/self-join on positions. */
  private def bigramsOf(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))

  /** Bigram tier of the same signal — context-sensitive
    * in-distribution mass (the CCNet-style perplexity filter, kept
    * log-free for cross-engine exactness): conditional probability
    * p(w2|w1) = c(w1 w2) / c(w1) for the top `vocabSize` bigrams by
    * count (ties to lexicographic). Fit is two histograms (each one
    * map-side-combined shuffle); the denominator join runs AFTER the
    * top-K cut, so only vocabSize rows meet the unigram table. The model
    * is a driver-small dimension table, like [[fit]]'s. */
  def fitBigrams(docs: DataFrame, text: String, vocabSize: Int): DataFrame = {
    val bigs = docs
      .select(explode(bigramsOf(TextStats.tokens(lower(col(text))))).as("big"))
      .groupBy("big").count()
    val unis = docs
      .select(explode(TextStats.tokens(lower(col(text)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    bigs.orderBy(desc("count"), asc("big")).limit(vocabSize)
      .withColumn("w1", split(col("big"), " ").getItem(0))
      .join(unis, col("w1") === col("tok"))
      .select(col("big"), (col("count").cast("double") / col("c1")).as("p"))
  }

  /** Per-doc bigram LM score: (id, n_bigrams, n_oov, mean_p) with the
    * identical decimal-sum / floor-round parity discipline as [[score]].
    * Docs with <2 tokens score 0.0 with n_bigrams 0. */
  def scoreBigrams(docs: DataFrame, id: String, text: String,
                   model: DataFrame): DataFrame = {
    val bigs = docs.select(col(id).as("__doc"),
      explode_outer(bigramsOf(TextStats.tokens(lower(col(text))))).as("big"))
    val p9 = (floor(coalesce(col("p"), lit(0.0)) * 1e9 + 0.5) / 1e9)
      .cast("decimal(28,12)")
    bigs.join(broadcast(model.select(col("big"), col("p"))),
        Seq("big"), "left")
      .groupBy(col("__doc"))
      .agg(count(col("big")).as("n_bigrams"),
        count(when(col("big").isNotNull && col("p").isNull, 1))
          .as("n_oov"),
        sum(when(col("big").isNotNull, p9)).as("__sp"))
      .select(col("__doc").as(id), col("n_bigrams"), col("n_oov"),
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(floor(col("__sp").cast("double") / col("n_bigrams")
            * 1e6 + 0.5) / 1e6).as("mean_p"))
  }

  /** Coverage-targeted vocabulary pruning — the tokenizer-training step
    * that picks the SMALLEST high-frequency vocabulary covering at least
    * `num/den` of total token mass: the prefix of the (count desc, tok
    * asc) order whose cumulative mass first reaches the target. The
    * coverage test is exact integer arithmetic
    * (den·cum_before < num·total — a token enters while coverage is
    * still short), no float knife-edge for an oracle to disagree on.
    * `total` is a LAZY one-row aggregate broadcast-crossed back onto
    * the histogram ([[fit]]'s own discipline — fit's doc comment names
    * the eager `head()` total as the shape it replaced: a driver action
    * that runs the full scan→explode→groupBy a second time, so the
    * corpus would be tokenized TWICE; here all consumers sit on the one
    * histogram exchange and ReuseExchange tokenizes once), and the
    * cumulative mass is the
    * q65/q86 distributed prefix sum, NOT one global window (a web-scale
    * histogram has ~10^8-10^9 distinct tokens — one sort partition would
    * serialize it): tokens range-bucket by length(bin(c)) — exact
    * integer log2, so (bucket desc, c desc, tok asc) IS the global
    * (c desc, tok asc) order — a <=64-row offset table re-enters as a
    * broadcast, and the window is bucket-local. */
  def coverageVocab(docs: DataFrame, text: String,
                    num: Int, den: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = docs
      .select(explode(TextStats.tokens(lower(col(text)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val total = hist.agg(sum("c").as("__total"))
    val bucketed = hist.withColumn("__b", length(bin(col("c"))))
    val offsets = bucketed.groupBy("__b").agg(sum("c").as("__bc"))
      .withColumn("__off", coalesce(sum(col("__bc")).over(
        Window.orderBy(desc("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__b", "__off")
    val wb = Window.partitionBy("__b").orderBy(desc("c"), asc("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsets), Seq("__b"))
      .crossJoin(broadcast(total))
      .withColumn("cum", sum("c").over(wb) + col("__off"))
      .filter(lit(den.toLong) * (col("cum") - col("c")) <
        lit(num.toLong) * col("__total"))
      .select("tok")
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): each document scored
    * against BOTH a target-domain model and a raw-corpus model in ONE
    * pass — a single explode (the expensive step at corpus scale: token
    * rows >> doc rows) feeds two broadcast vocabulary joins and one
    * aggregation, instead of scoring twice and joining doc-level results
    * (which would tokenize the corpus twice and add a doc_id shuffle).
    * The weight is the ratio of in-distribution masses
    * w = p_target / (p_raw + 1e-6) — the paper's likelihood ratio kept
    * LOG-FREE (a product of per-token ratios over/underflows doubles and
    * ln is not bit-identical across engines — the q74 lesson); both
    * masses use [[score]]'s exact decimal-sum discipline, so the one
    * float divide is IEEE-identical in any engine. Output:
    * (id, n_tokens, p_target, p_raw, dsir_w). Downstream selection is
    * deterministic top-K on (dsir_w desc, id asc) — Spark plans
    * orderBy+limit as TakeOrdered (distributed per-partition top-K +
    * driver merge of K-row heads, no global sort). */
  def dsirWeights(docs: DataFrame, id: String, text: String,
                  targetVocab: DataFrame, rawVocab: DataFrame): DataFrame = {
    val toks = docs.select(col(id).as("__doc"),
      explode_outer(TextStats.tokens(lower(col(text)))).as("tok"))
    def p9(c: Column): Column =
      (floor(coalesce(c, lit(0.0)) * 1e9 + 0.5) / 1e9).cast("decimal(28,12)")
    def mass(sumCol: Column): Column =
      when(col("n_tokens") === 0, lit(0.0))
        .otherwise(floor(sumCol.cast("double") / col("n_tokens")
          * 1e6 + 0.5) / 1e6)
    toks
      .join(broadcast(targetVocab.select(col("tok"), col("p").as("__pt"))),
        Seq("tok"), "left")
      .join(broadcast(rawVocab.select(col("tok"), col("p").as("__pr"))),
        Seq("tok"), "left")
      .groupBy(col("__doc"))
      .agg(count(col("tok")).as("n_tokens"),
        sum(when(col("tok").isNotNull, p9(col("__pt")))).as("__st"),
        sum(when(col("tok").isNotNull, p9(col("__pr")))).as("__sr"))
      .select(col("__doc").as(id), col("n_tokens"),
        mass(col("__st")).as("p_target"), mass(col("__sr")).as("p_raw"))
      .withColumn("dsir_w",
        floor(col("p_target") / (col("p_raw") + 1e-6) * 1e6 + 0.5) / 1e6)
  }

  /** CCNet-style quality partitioning (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data"): split a
    * scored corpus into head/middle/tail by the terciles of the per-doc
    * LM score — head trains as-is, middle gets a second look, tail is
    * dropped. The cut points are EXACT percentiles (the q57
    * quantile_cont-parity aggregate), not approx_percentile, and that is
    * corpus-scalable here because [[score]] floor-quantizes mean_p to
    * 1e-6 in [0,1]: the percentile aggregator's state is a value→count
    * map bounded by the ~1e6-value domain (map-side combined) no matter
    * how many documents flow in — exactness does not cost corpus-scale
    * memory. The two cuts are one extra one-row aggregate over the
    * already-scored rows, broadcast back as a scalar dimension (no
    * driver action, no second scoring pass); the label is two
    * comparisons against bit-identical thresholds, so a tie on a cut
    * value lands in the higher bucket in every engine. */
  def qualityBuckets(scored: DataFrame, scoreCol: String): DataFrame = {
    val cuts = scored.agg(
      percentile(col(scoreCol), lit(1.0 / 3)).as("__c1"),
      percentile(col(scoreCol), lit(2.0 / 3)).as("__c2"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col(scoreCol) >= col("__c2"), lit("head"))
          .when(col(scoreCol) >= col("__c1"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("__c1", "__c2")
  }

  /** Per-doc LM score against a fitted vocabulary:
    * (id, n_tokens, n_oov, mean_p). Empty/whitespace docs score 0.0 with
    * n_tokens 0. */
  def score(docs: DataFrame, id: String, text: String,
            vocab: DataFrame): DataFrame = {
    // explode_outer keeps zero-token docs (tok null) in the aggregation
    val toks = docs.select(col(id).as("__doc"),
      explode_outer(TextStats.tokens(lower(col(text)))).as("tok"))
    val p9 = (floor(coalesce(col("p"), lit(0.0)) * 1e9 + 0.5) / 1e9)
      .cast("decimal(28,12)")
    toks.join(broadcast(vocab.select(col("tok"), col("p"))),
        Seq("tok"), "left")
      .groupBy(col("__doc"))
      .agg(count(col("tok")).as("n_tokens"),
        count(when(col("tok").isNotNull && col("p").isNull, 1))
          .as("n_oov"),
        sum(when(col("tok").isNotNull, p9)).as("__sp"))
      .select(col("__doc").as(id), col("n_tokens"), col("n_oov"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(floor(col("__sp").cast("double") / col("n_tokens")
            * 1e6 + 0.5) / 1e6).as("mean_p"))
  }

  /** Per-class unigram vocabularies in ONE corpus pass: (cls, tok, p)
    * with the top `vocabSize` types of EACH class — the model behind
    * [[routeByClass]]'s classifier. One melt+groupBy shuffle builds the
    * (class, token) histogram; per-class totals are a class-count-sized
    * aggregate (classes are few: sources, languages, quality tiers);
    * probabilities are true per-class MLE (totals count ALL occurrences,
    * including types cut by the limit), exactly like [[fit]].
    *
    * Top-K per class is EXACT and never sorts a class's whole histogram
    * in one task (the q88 length-bin trick, adapted from cumulative mass
    * to cumulative headcount): rows bucket by the integer log2 of their
    * count; a bucket whose higher buckets already hold >= K rows of the
    * class cannot contain a top-K member, so the rank window only ever
    * sees the few magnitude bands straddling rank K — at web scale that
    * is thousands of rows per class, not the ~1e8-type histogram. */
  def fitClassVocab(docs: DataFrame, classCol: String, text: String,
                    vocabSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = docs
      .select(col(classCol).as("cls"),
        explode(TextStats.tokens(lower(col(text)))).as("tok"))
      .groupBy("cls", "tok").agg(count(lit(1)).as("c"))
    val totals = hist.groupBy("cls").agg(sum("c").cast("double").as("__tot"))
    val bucketed = hist.withColumn("__b", length(bin(col("c"))))
    val keep = bucketed.groupBy("cls", "__b").agg(count(lit(1)).as("__n"))
      .withColumn("__before", coalesce(sum("__n").over(
        Window.partitionBy("cls").orderBy(desc("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__before") < vocabSize)
      .select("cls", "__b")
    val w = Window.partitionBy("cls").orderBy(desc("c"), asc("tok"))
    bucketed.join(broadcast(keep), Seq("cls", "__b"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= vocabSize)
      .join(broadcast(totals), Seq("cls"))
      .select(col("cls"), col("tok"),
        (col("c").cast("double") / col("__tot")).as("p"))
  }

  /** Classifier-based routing — the quality/domain-classifier stage of a
    * curation pipeline (the GPT-3 appendix-A / LLaMA "reference-like"
    * filter shape, with the class-conditional unigram mass standing in
    * for fastText's linear score, kept LOG-FREE so it is exact across
    * engines): score every document against EVERY class vocabulary from
    * [[fitClassVocab]] and emit the argmax class.
    *
    * One explode feeds one broadcast join against the stacked model
    * (classes x vocabSize rows — driver-small); per-(doc, class) masses
    * use [[score]]'s decimal-sum discipline; the doc x class score grid
    * is completed with a broadcast cross of the class list (zero-hit
    * classes score 0.0, so a doc with no in-vocab token routes to the
    * lexicographically smallest class — deterministic in any engine);
    * the winner is a rank-1 window over the K class rows of each doc.
    * Output: (id, pred_cls, n_tokens, mass). Shuffles are doc-keyed and
    * carry K rows per doc — corpus-scale-safe for the tens of classes a
    * real mixture has. */
  def routeByClass(docs: DataFrame, id: String, text: String,
                   model: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The model is driver-small BY CONTRACT (classes x vocabSize rows —
    // the fitClassVocab output shape), so materialize it ONCE and
    // re-enter it as a local relation (the IVF-centroid discipline):
    // referencing the incoming plan from both the scoring join and the
    // class list would execute the whole fit pipeline — a corpus
    // tokenize — twice.
    val spark = docs.sparkSession
    val localModel = {
      val m = model.select(col("cls"), col("tok"), col("p"))
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(m.collect().toSeq.asJava, m.schema)
    }
    val toks = docs.select(col(id).as("__doc"),
      explode_outer(TextStats.tokens(lower(col(text)))).as("tok"))
    // n_tokens is a PROJECTION on the doc row (array length), not a
    // count over the exploded stream — one corpus tokenize for scoring,
    // zero for counting.
    val nTok = docs.select(col(id).as("__doc"),
      coalesce(size(TextStats.tokens(lower(col(text)))).cast("long"),
        lit(0L)).as("n_tokens"))
    // The model join fans each matching token out to up to K class rows
    // (the top-K vocabularies are exactly the most frequent tokens, so
    // MOST occurrences match), making this aggregation the operator's
    // volume peak. Sum the exact INTEGER numerators floor(p*1e9+0.5) as
    // a primitive long (codegen'd, map-side combined) instead of the
    // score()/dsirWeights() decimal path — measured 3.0s -> ~0.5s on the
    // fan-out volume at sf0.1. Exactness is unchanged: the per-token
    // numerator is an integer <= 1e9, the long sum is order-free, and
    // sum/1e9 is float-exact below 2^53 (holds for any document under
    // ~9e6 tokens — far beyond any real document); the single fixed
    // division sequence (sum -> /1e9 -> /n_tokens) is IEEE-identical in
    // any engine.
    val sums = toks
      .join(broadcast(localModel.select(col("tok"), col("cls"), col("p"))),
        Seq("tok"))
      .groupBy("__doc", "cls")
      .agg(sum(floor(col("p") * 1e9 + 0.5).cast("long")).as("__sn"))
    val classes = localModel.select("cls").distinct()
    val grid = nTok.crossJoin(broadcast(classes))
    val w = Window.partitionBy("__doc").orderBy(desc("mass"), asc("cls"))
    grid.join(sums, Seq("__doc", "cls"), "left")
      .select(col("__doc"), col("cls"), col("n_tokens"),
        when(col("n_tokens") === 0 || col("__sn").isNull, lit(0.0))
          .otherwise(floor(col("__sn").cast("double") / 1e9
            / col("n_tokens") * 1e6 + 0.5) / 1e6).as("mass"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__doc").as(id), col("cls").as("pred_cls"),
        col("n_tokens"), col("mass"))
  }

  /** Single-pass [[routeByClass]] — the production form: the stacked
    * (cls, tok, p) model is pivoted ONCE on the driver into a merged
    * token → per-class-numerator-vector map (token rows are unique, so
    * the broadcast scoring join has NO K-way fan-out), every document
    * is tokenized ONCE (token count and all K class masses come out of
    * the same aggregation), and the winner is an argmax PROJECTION over
    * the K mass columns instead of a doc×class grid + rank window.
    * Row-identical to [[routeByClass]] by construction
    * (VariantEquivalenceSpec gates it): per-(doc, class) numerators are
    * the same integer sums — a token absent from class k's vocabulary
    * contributes the same 0 whether it fails a join (sibling) or reads
    * a 0 slot (here) — the mass formula is the identical fixed division
    * sequence, and the ascending-class when-chain reproduces the
    * window's (desc mass, asc cls) tie-break exactly (masses are
    * 1e-6-grid doubles, so equality is bit-safe).
    *
    * Per doc the plan carries ONE exploded token stream, one broadcast
    * hash probe per token, and K+1 primitive-long aggregates (codegen'd,
    * map-side combined) — shuffle volume is docs × (K+1) longs, K-free
    * in the token dimension. The merged map is classes × vocabSize
    * rows wide — driver-small by the [[fitClassVocab]] contract. */
  def routeByClassMerged(docs: DataFrame, id: String, text: String,
                         model: DataFrame,
                         carry: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = docs.sparkSession
    // materialize the driver-small model once (the routeByClass /
    // IVF-centroid discipline: never reference a fit pipeline twice)
    val rows = model.select(col("cls"), col("tok"), col("p")).collect()
    // Sort classes by UTF-8 BYTE order, not Scala's default String
    // ordering: the sibling routeByClass tie-breaks with Spark's
    // asc("cls"), which compares UTF8String bytes (= code points).
    // Scala's String.compareTo compares UTF-16 code UNITS, and the two
    // disagree for supplementary-plane characters (a surrogate pair's
    // lead unit 0xD800-0xDBFF sorts BELOW U+E000..U+FFFF in UTF-16 but
    // its code point U+10000+ sorts ABOVE them in UTF-8), which would
    // flip the argmax tie-break and break the row-identity contract.
    val classes = rows.map(_.getString(0)).distinct
      .sortWith { (a, b) =>
        val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n && x(i) == y(i)) i += 1
        if (i < n) (x(i) & 0xff) < (y(i) & 0xff) else x.length < y.length
      }
    val k = classes.length
    require(k >= 1, "routeByClassMerged needs at least one class")
    val clsIdx = classes.zipWithIndex.toMap
    val merged = rows.groupBy(_.getString(1)).toSeq.map { case (tok, rs) =>
      val arr = Array.fill(k)(0L)
      rs.foreach { r =>
        arr(clsIdx(r.getString(0))) =
          math.floor(r.getDouble(2) * 1e9 + 0.5).toLong
      }
      Row.fromSeq(tok +: arr.toSeq)
    }
    val schema = StructType(StructField("tok", StringType) +:
      (0 until k).map(i => StructField(s"__n$i", LongType)))
    import scala.jdk.CollectionConverters._
    val mergedDf = spark.createDataFrame(merged.asJava, schema)
    // `carry` columns ride the explode and the groupBy (they are
    // functionally dependent on the doc id), so a caller needing a doc
    // attribute next to the route (q100's `source`) pays NO join-back
    // shuffle — the attribute never leaves the row.
    val toks = docs.select(col(id).as("__doc") +: carry.map(col) :+
      explode_outer(TextStats.tokens(lower(col(text)))).as("tok"): _*)
    val agg = toks
      .join(broadcast(mergedDf), Seq("tok"), "left")
      .groupBy(col("__doc") +: carry.map(col): _*)
      .agg(count(col("tok")).as("n_tokens"),
        (0 until k).map(i =>
          sum(coalesce(col(s"__n$i"), lit(0L))).as(s"__s$i")): _*)
    // argmax as an ARRAY projection, not a K-branch when-chain over a
    // greatest(): withColumn aliases are inlined by projection collapse,
    // so a when-chain would copy the K-arg greatest K more times (the
    // q231 plan-size lesson). array_position finds the FIRST index of
    // the max — classes are sorted ascending, so this IS the sibling
    // window's (desc mass, asc cls) tie-break; masses are 1e-6-grid
    // doubles, so the equality inside array_position is bit-safe.
    val masses = array((0 until k).map(i =>
      when(col("n_tokens") === 0, lit(0.0))
        .otherwise(floor(col(s"__s$i").cast("double") / 1e9
          / col("n_tokens") * 1e6 + 0.5) / 1e6)): _*)
    agg.withColumn("__ms", masses)
      .select(col("__doc").as(id) +: carry.map(col) :+
        element_at(typedlit(classes.toSeq),
          array_position(col("__ms"), array_max(col("__ms"))).cast("int"))
          .as("pred_cls") :+
        col("n_tokens") :+
        array_max(col("__ms")).as("mass"): _*)
  }

  /** Vocabulary drift between two corpus snapshots — the data-drift
    * monitor a pipeline reads between crawls (a shifted token
    * distribution is the early signal that quality filters, classifier
    * thresholds, and mixture weights were tuned on stale data): the top
    * `vocabSize` token distributions of each snapshot ([[fit]] MLE,
    * totals over ALL occurrences), full-outer-joined on the token with
    * each side's probability quantized to 1e-9 (absent = 0), plus the
    * per-token absolute gap `delta`. `0.5 * sum(delta)` over the rows is
    * the total-variation distance restricted to the joined vocabulary —
    * kept LOG-FREE (no KL/JS: ln is not bit-identical across engines,
    * the q74 lesson) and truncation-scoped BY DESIGN: both top-K sets
    * cover the head of each distribution; drift in the tail below both
    * cuts is invisible at any K, which is the standard operating point
    * for a monitor (the head moves first — new boilerplate, template
    * shifts, language-mix changes all surface as head churn).
    *
    * Two independent fits (each one melt+groupBy shuffle over its
    * snapshot); the join is vocab-sized (<= 2K rows) — driver-light,
    * corpus-scale-safe. */
  def vocabDrift(a: DataFrame, b: DataFrame, text: String,
                 vocabSize: Int): DataFrame = {
    def q9(c: Column): Column =
      floor(coalesce(c, lit(0.0)) * 1e9 + 0.5) / 1e9
    val va = fit(a, text, vocabSize).select(col("tok"), col("p").as("__pa"))
    val vb = fit(b, text, vocabSize).select(col("tok"), col("p").as("__pb"))
    va.join(vb, Seq("tok"), "full_outer")
      .select(col("tok"), q9(col("__pa")).as("p_a"), q9(col("__pb")).as("p_b"))
      .withColumn("delta",
        floor(abs(col("p_a") - col("p_b")) * 1e9 + 0.5) / 1e9)
  }
}
