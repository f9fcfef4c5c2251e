package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword relevance scoring over the documents table — the retrieval
  * primitive (BM25) that corpus tooling runs for eval-set construction,
  * targeted corpus slicing, and search-style audits.
  *
  * Scale posture: TWO passes, no joins at all on the document side.
  * Pass 1 aggregates the corpus statistics BM25 needs — N, avgdl, and one
  * document frequency per query term — into a single driver-sized row
  * (|terms| + 2 numbers; the [[IvfIndex]] centroid-literal discipline).
  * Pass 2 scores every document in one codegen'd projection: per-term tf
  * via the `count_in` kernel, the BM25 formula over inlined literal
  * statistics. No shuffle touches the corpus; the plan is scan → project
  * (→ the harness's presentation sort).
  *
  * Engine-exactness: `linearIdf = true` (default) scores with the raw
  * Robertson idf ratio (N − df + 0.5)/(df + 0.5) WITHOUT the log — the
  * same dodge q59's tf-idf documents: `ln` is not bit-identical across
  * engines (libm vs JVM), while +,*,/ on doubles are IEEE-exact
  * everywhere, so the oracle can reproduce scores bit-for-bit. The log
  * is monotone, so rankings are IDENTICAL to textbook BM25 for
  * single-term queries and near-identical for short conjunctive queries;
  * production flips `linearIdf = false` for textbook scores when no
  * cross-engine hash contract is in play. */
object Rank {

  /** Per-document BM25 score for a fixed bag of query terms.
    * Emits (id, dl, bm25) for documents with bm25 > 0 — i.e. containing
    * at least one query term. Terms are matched as whole lowercased
    * whitespace tokens (the corpus tokenizer contract). */
  def bm25(docs: DataFrame, id: String, text: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75,
           linearIdf: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // null-text docs are unscoreable and must not inflate N/avgdl
    val scored = docs.filter(col(text).isNotNull)
    val toks = TextStats.tokens(lower(col(text)))
    def tf(term: String): Column =
      call_function("count_in", toks, array(lit(term.toLowerCase)))
    val perDoc = scored.select(
      Seq(col(id), size(toks).cast("long").as("dl")) ++
        terms.zipWithIndex.map { case (t, i) => tf(t).as(s"tf$i") }: _*)
    // pass 1: driver-sized stats row (|terms| + 2 numbers)
    val aggs = Seq(sum(col("dl")).as("sumdl")) ++
      terms.indices.map(i => sum((col(s"tf$i") > 0).cast("long")).as(s"df$i"))
    val statsRow = perDoc.agg(count(lit(1)).as("n"), aggs: _*).head()
    val n = statsRow.getAs[Long]("n")
    require(n > 0, "bm25 over an empty corpus")
    val avgdl = statsRow.getAs[Long]("sumdl").toDouble / n
    // pass 2: pure projection — statistics enter as plan literals
    val score = terms.indices.map { i =>
      val df = statsRow.getAs[Long](s"df$i")
      val idfRatio = (n - df + 0.5) / (df + 0.5)
      val idf = if (linearIdf) idfRatio else math.log(idfRatio)
      val tfd = col(s"tf$i").cast("double")
      lit(idf) * (tfd * lit(k1 + 1)) /
        (tfd + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / lit(avgdl))))
    }.reduce(_ + _)
    perDoc.select(col(id), col("dl"),
        (floor(score * 1e6 + 0.5) / 1e6).as("bm25"))
      .filter(col("bm25") > 0)
  }
}
