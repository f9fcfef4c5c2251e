package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextStats}
import graft.sources.Sources

/** LLM training-data corpus cleaning as one runnable `spark-submit` job —
  * the composition every large-scale data pipeline runs before
  * tokenization, packaged the way the reference packages its medallion
  * jobs (thin `main` over a testable `run`):
  *
  *   score (language-ID, quality, token count)
  *     -> filter (lang allowlist, quality floor, token bounds)
  *     -> exact dedup (bag-of-words fingerprint, keep min id)
  *     -> near-dup collapse (candidate pairs -> connected components,
  *        keep each group's min id)
  *     -> write cleaned parquet
  *
  * Near-dup candidates come from MinHash-LSH by default (bucketed,
  * approximate recall — the 100 TB path) or, with `nearDup=prefix`, the
  * exact prefix-filtered join (same pair set as all-pairs, no crossJoin;
  * costs a df ranking pass — right when exactness matters more than the
  * last 20% of throughput). Every stage is equi-join/agg-shaped; nothing
  * is all-pairs.
  */
object CorpusClean {

  /** Per-stage retention counts, returned for observability and asserted
    * in JobsSpec. */
  case class Stats(input: Long, afterFilter: Long, afterExact: Long,
                   kept: Long)

  // format: off
  def run(spark: SparkSession, inDir: String, outDir: String,
          lang: String = "en", minQuality: Double = 0.5,
          minTokens: Long = 5, maxTokens: Long = 5000,
          nearDup: String = "minhash", threshold: Double = 0.6,
          shingleK: Int = 3): Stats = {
    // format: on
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(inDir)
    // stage counts ride the pipeline's own passes as CollectMetrics
    // (Observation) — a 100 TB corpus cannot afford dedicated count()
    // recomputations of the scoring stage just for observability
    val stageObs = org.apache.spark.sql.Observation("corpus_clean_stages")
    // lang = "*" admits every language (corpora that are multilingual by
    // design, or synthetic scaling corpora whose replicas defeat langId)
    val langOk = if (lang == "*") lit(true) else col("lang") === lang
    val keepCond = langOk && col("quality") >= minQuality &&
      col("n_tokens").between(minTokens, maxTokens)
    val scored = docs.select(col("doc_id"), col("text"),
        TextStats.langId(col("text")).as("lang"),
        TextStats.qualityScore(col("text")).as("quality"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextStats.fingerprint(col("text")).as("fp"))
      .observe(stageObs, count(lit(1)).as("input"),
        count(when(keepCond, 1)).as("after_filter"))
    val filtered = scored.filter(keepCond)
    // exact dedup: one representative (min id) per bag-of-words
    // fingerprint. A window rank is ONE shuffle on fp; the agg+self-join
    // formulation this replaced shuffled twice and scanned `filtered` in
    // two plan branches (which would also double-count the Observation)
    val exactKept = filtered
      .withColumn("__rn", row_number().over(
        Window.partitionBy("fp").orderBy("doc_id")))
      .filter(col("__rn") === 1)
      .select("doc_id", "text", "lang", "quality", "n_tokens")
      .cache() // reused: pair generation + representative anti-join + write
    // One deliberate pass fills the cache and fires the stage metrics;
    // every downstream consumer (pair gen's first job runs under
    // localCheckpoint, where CollectMetrics never fires) reads cached
    // blocks and never re-executes the scoring stage.
    exactKept.write.format("noop").mode("overwrite").save()
    // near-dup collapse: pairs -> components -> drop non-representatives
    val pairs = nearDup match {
      case "minhash" => Dedup.minhashLsh(exactKept, "doc_id", "text",
        shingleK, threshold = threshold)
      case "prefix" => Dedup.prefixJaccardPairs(exactKept, "doc_id", "text",
        shingleK, threshold)
      case other => sys.error(s"nearDup must be minhash|prefix, got $other")
    }
    val nonReps = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .filter(col("node") =!= col("label")) // label = component's min id
      .select(col("node").as("doc_id"))
    val keptObs = org.apache.spark.sql.Observation("corpus_clean_kept")
    val cleaned = exactKept.join(nonReps, Seq("doc_id"), "left_anti")
      .observe(keptObs, count(lit(1)).as("kept"))
    try {
      Sources.writeParquet(cleaned, outDir)
      Stats(stageObs.get("input").asInstanceOf[Long],
        stageObs.get("after_filter").asInstanceOf[Long],
        exactKept.count(), // cached blocks — no recompute
        keptObs.get("kept").asInstanceOf[Long])
    } finally exactKept.unpersist()
  }

  def main(args: Array[String]): Unit = args match {
    case Array(inDir, outDir, rest @ _*) =>
      val spark = Jobs.session()
      try {
        val s = run(spark, inDir, outDir,
          lang = rest.headOption.getOrElse("en"),
          minQuality = rest.lift(1).map(_.toDouble).getOrElse(0.5),
          nearDup = rest.lift(2).getOrElse("minhash"))
        println(s"[corpus-clean] input=${s.input} afterFilter=${s.afterFilter} " +
          s"afterExactDedup=${s.afterExact} kept=${s.kept}")
      } finally spark.stop()
    case _ => sys.error(
      "usage: graft.jobs.CorpusClean <inDir> <outDir> [lang] [minQuality] [minhash|prefix]")
  }
}
