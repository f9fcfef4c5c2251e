package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the 4× memory/IO lever for
  * embedding-heavy stages: a 100 TB float32 embedding column becomes
  * 25 TB of tinyints plus one scale per vector, and every ANN probe or
  * near-dup candidate scan reads a quarter of the bytes. Symmetric
  * per-vector scheme (the standard faiss-style SQ8 shape):
  *
  *   q_i = floor(x_i / max|x| * 127 + 0.5)   (zero vector -> all zeros)
  *
  * For COSINE the per-vector scales cancel exactly —
  * cos_q = Σ q_a q_b / (√Σq_a² √Σq_b²) — so quantized scoring is pure
  * integer sums (exact, order-free) plus one sqrt/divide: bit-identical
  * in any engine, which is what makes q81 hash-checkable. Dot products
  * (scores that DON'T cancel) reconstruct as s_a·s_b·Σq_a q_b via
  * [[scaleOf]].
  *
  * Everything here is a stateless projection over `functions._` higher-
  * order ops — no UDF, no shuffle; quantization cost is one pass over
  * the vectors and is absorbed into whatever scan produces them.
  */
object Quant {

  /** Per-vector scale s = max|x| / 127 (0.0 for the zero vector);
    * dequantized x_i ≈ q_i * s. Kept as double for exact parity. */
  def scaleOf(vec: Column): Column =
    coalesce(array_max(transform(vec,
      x => abs(x.cast("double")))) / 127.0, lit(0.0))

  /** Quantize a float vector to array<tinyint> in [-127, 127]. The
    * ratio x/max|x| lies in [-1, 1], so floor(r*127 + 0.5) never leaves
    * the int8 range — no clamp needed. */
  def quantize(vec: Column): Column = {
    val mx = array_max(transform(vec, x => abs(x.cast("double"))))
    when(mx.isNull || mx === 0.0,
      transform(vec, _ => lit(0).cast("tinyint")))
      .otherwise(transform(vec,
        x => floor(x.cast("double") / mx * 127.0 + 0.5).cast("tinyint")))
  }

  /** Exact integer dot product of two quantized vectors (long — 64 dims
    * of ±127 peaks at ~10^6, nowhere near overflow). Native kernel
    * (graft.parse.IntDotExpr — one tight loop; the HOF composition
    * evaluates its lambda interpreted per element inside the n×q scoring
    * join). QuantSpec property-tests kernel == composition. */
  def intDot(a: Column, b: Column): Column = call_function("vec_dot_i", a, b)

  /** The pure-`functions._` composition [[intDot]] replaces — kept as the
    * independent reference the kernel is property-tested against. */
  def intDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Cosine in the quantized domain (scales cancel), floor-rounded to
    * 1e-6 for cross-engine hash parity; zero-norm vectors score 0. */
  def cosineQ(a: Column, b: Column): Column = {
    val na = intDot(a, a); val nb = intDot(b, b)
    when(na === 0 || nb === 0, lit(0.0))
      .otherwise(floor(intDot(a, b).cast("double") /
        (sqrt(na.cast("double")) * sqrt(nb.cast("double")))
        * 1e6 + 0.5) / 1e6)
  }

  /** Brute-force top-k in the quantized domain — q19's shape, quarter
    * the candidate bytes. `queries(qid, qvec)` × `corpus(nid, nvec)`
    * with float vectors; quantization happens inside. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("qid"), quantize(col("qvec")).as("qq"))
    val c = corpus.select(col("nid"), quantize(col("nvec")).as("qn"))
    val w = Window.partitionBy("qid").orderBy(desc("qcos"), asc("nid"))
    c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("qcos", cosineQ(col("qq"), col("qn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "qcos", "rank")
  }
}
