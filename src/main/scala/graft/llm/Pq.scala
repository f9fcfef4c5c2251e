package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the embedding-compression half of the
  * similarity-search family (Jégou/Douze/Schmid, "Product Quantization
  * for Nearest Neighbor Search", IEEE PAMI 2011 — the faiss IndexPQ
  * core), complementing [[IvfIndex]] (which prunes WHICH rows are
  * scored; PQ shrinks WHAT each scored row costs):
  *
  *   - the vector is split into `m` contiguous subvectors of `dsub`
  *     dims; each subspace gets its own `ksub`-centroid codebook
  *     (KMeans, fit independently per subspace);
  *   - a corpus vector is stored as `m` small codes (one byte each at
  *     ksub <= 256) instead of `d` floats — 64 float32 dims at
  *     m=8/ksub=16 become 8 codes: a 32× byte cut on the scored side,
  *     which at 100 TB is the difference between an embedding column
  *     that fits executor memory and one that doesn't;
  *   - asymmetric distance computation (ADC): a query stays float and
  *     scores against the RECONSTRUCTED corpus vector,
  *     `adc(q, n) = Σ_j  q_j · centroid_j[code_j(n)]` — exactly the dot
  *     product with the decoded vector, so the approximation error is
  *     entirely the codebook's quantization error, never the scorer's.
  *
  * Everything is Spark-first: the codebooks are driver-tiny
  * (m × ksub × dsub doubles) and enter plans as LITERALS — the corpus
  * side never joins a codebook table, encode/score are pure projections
  * (no UDF, no shuffle beyond the top-k window). Distance arithmetic is
  * written in the exact per-element fold order DuckDB's `list_sum`
  * replays, so a run-state oracle can inline the fitted codebooks and
  * re-derive codes, ADC scores, and ranks independently (the q39
  * technique).
  */
object Pq {

  /** Fitted codebooks: `centroids(j)(c)` is subspace j's centroid c
    * (dsub doubles, float-rounded at fit so save/load and fit-then-use
    * enter plans bit-identically). */
  final case class Model(m: Int, ksub: Int, dsub: Int,
                         centroids: Seq[Seq[Seq[Double]]]) {
    require(centroids.size == m &&
      centroids.forall(t => t.size == ksub && t.forall(_.size == dsub)))

    /** Persist as a tiny parquet (sub, code, centroid). */
    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      (for (j <- 0 until m; c <- 0 until ksub)
        yield (j, c, centroids(j)(c)))
        .toDF("sub", "code", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
  }

  def load(spark: SparkSession, path: String): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("sub"), col("code"), col("centroid"))
      .as[(Int, Int, Seq[Double])].collect()
    val m = rows.map(_._1).max + 1
    val ksub = rows.map(_._2).max + 1
    val byKey = rows.map { case (j, c, v) => (j, c) -> v }.toMap
    Model(m, ksub, byKey.head._2.size,
      (0 until m).map(j => (0 until ksub).map(c => byKey((j, c)))))
  }

  /** Fit one KMeans codebook per subspace over (a sample of) the
    * corpus. Deterministic under the fixed seed. `corpus` must expose
    * the embedding as `vecCol` (array of floats/doubles, d = m·dsub).
    * The m fits run sequentially; each is a DISTRIBUTED MLlib fit over
    * the dsub-dim slices, so fitting scales with the corpus, and the
    * result is driver-tiny. Centroids are float-rounded so the model
    * enters plans exactly as [[load]] would re-enter it. */
  def fit(corpus: DataFrame, vecCol: String, m: Int = 8, ksub: Int = 16,
          seed: Long = 42L, fitFraction: Double = 1.0,
          maxIter: Int = 10): Model = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val d = corpus.select(size(col(vecCol))).first().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    val src =
      (if (fitFraction >= 1.0) corpus else corpus.sample(fitFraction, seed))
        .select(col(vecCol).cast("array<double>").as("v"))
        .persist() // m fits re-read the same slices
    val tables = (0 until m).map { j =>
      val train = src.select(array_to_vector(
        slice(col("v"), j * dsub + 1, dsub)).as("features"))
      val km = new KMeans().setK(ksub).setSeed(seed + j)
        .setMaxIter(maxIter).fit(train)
      km.clusterCenters.toSeq.map(_.toArray.toSeq
        .map(x => x.toFloat.toDouble))
    }
    src.unpersist()
    Model(m, ksub, dsub, tables)
  }

  /** Per-element squared-distance fold in the exact order the oracle's
    * `list_sum(list_apply(list_zip(...)))` replays. Kept as the
    * spec-readable reference form ([[encode]] uses the pq_code kernel,
    * whose distances PqSpec pins against this composition). */
  private[llm] def l2(sub: Column, cent: Seq[Double]): Column =
    aggregate(
      zip_with(sub, typedLit(cent), (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, x) => acc + x)

  private def dot(sub: Column, cent: Column): Column =
    aggregate(zip_with(sub, cent, (x, c) => x * c),
      lit(0.0), (acc, x) => acc + x)

  /** Adds code columns `code_0 .. code_{m-1}` (int, first-min argmin —
    * the cross-engine tie-break) for `vecCol`. One pq_code kernel call
    * per subspace (graft.parse.PqCodeExpr): the previous expression-tree
    * form (array of ksub l2 folds + array_min + array_position per
    * subspace, staged projections) evaluated m×ksub interpreted HOF
    * folds per row — and its kernelized variant produced a generated
    * method big enough that HotSpot refused to JIT it (q239 measured
    * 2.7 s HOF vs 5.3+ s with 128 inlined vec_l2sq kernels; one call
    * per subspace benches 2.0 s). Codes are bit-identical: same (x−c)²
    * left fold per centroid, same first-min tie-break (PqSpec pins the
    * composition identity). */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val staged = (0 until model.m).foldLeft(
      df.withColumn("__pv", col(vecCol).cast("array<double>"))) {
      (acc, j) =>
        acc.withColumn(s"__sub_$j",
          slice(col("__pv"), j * model.dsub + 1, model.dsub))
    }
    val withCodes = (0 until model.m).foldLeft(staged) { (acc, j) =>
      acc.withColumn(s"code_$j",
        call_function("pq_code", col(s"__sub_$j"),
          typedLit(model.centroids(j))))
    }
    withCodes.drop("__pv" +:
      (0 until model.m).map(j => s"__sub_$j"): _*)
  }

  /** ADC score of a float query vector against a row's codes: the dot
    * product with the reconstructed corpus vector, one literal-table
    * pick + dsub-dot per subspace. Exactly `dot(q, decode(codes))` —
    * PqSpec pins the identity. */
  def adcScore(qvec: Column, model: Model,
               codeCol: Int => Column): Column =
    (0 until model.m).map { j =>
      dot(slice(qvec, j * model.dsub + 1, model.dsub),
        element_at(typedLit(model.centroids(j)), codeCol(j) + 1))
    }.reduce(_ + _)

  /** Top-k ADC neighbors per query: `queries(qid, qvec)` broadcast
    * against an [[encode]]d corpus (`nid`, `code_*`) — the corpus side
    * carries ONLY its m codes through the scoring join (the byte cut
    * that makes brute-force rescoring viable at scale); scores are
    * 1e-6-floored BEFORE ranking so rank order is engine-portable,
    * ties by nid. */
  def adcTopK(queries: DataFrame, encoded: DataFrame, model: Model,
              k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("qid"),
      col("qvec").cast("array<double>").as("qv"))
    val codeCols = (0 until model.m).map(j => col(s"code_$j"))
    val scored = encoded
      .select(col("nid") +: codeCols: _*)
      .join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("adc",
        floor(adcScore(col("qv"), model, j => col(s"code_$j"))
          * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy("qid").orderBy(desc("adc"), asc("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "adc", "rank")
  }
}
