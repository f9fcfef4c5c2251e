package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Product quantization contracts: ADC is EXACTLY the dot product with
  * the decoded vector (the approximation lives in the codebook, never
  * the scorer), encode picks the true argmin with the first-min
  * tie-break, save/load re-enters plans bit-identically, and top-k by
  * ADC equals top-k by reconstructed dot. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val emb = spark.read
    .parquet(s"$sf/embeddings.parquet")
    .filter(col("vec_id").isNotNull && col("embedding").isNotNull)

  private lazy val model = Pq.fit(emb, "embedding", m = 8, ksub = 16)

  test("fit shape and determinism under the fixed seed") {
    assert(model.m === 8 && model.ksub === 16 && model.dsub === 8)
    val again = Pq.fit(emb, "embedding", m = 8, ksub = 16)
    assert(again.centroids === model.centroids,
      "same data + seed must fit identical codebooks")
  }

  test("encode picks the argmin centroid per subspace (driver replay)") {
    val got = Pq.encode(emb.select(col("vec_id"),
        col("embedding").as("v")), "v", model)
      .select(col("vec_id") +:
        (0 until 8).map(j => col(s"code_$j")): _*)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(r.getInt)).toMap
    val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    vecs.foreach { case (id, v) =>
      (0 until 8).foreach { j =>
        val sub = v.slice(j * 8, j * 8 + 8)
        val ds = model.centroids(j).map(c =>
          sub.zip(c).map { case (x, cc) => (x - cc) * (x - cc) }.sum)
        val want = ds.indexOf(ds.min) // first min — the spec'd tie-break
        assert(got(id)(j) === want, s"vec $id subspace $j")
      }
    }
  }

  test("ADC score is exactly the dot with the decoded vector") {
    val enc = Pq.encode(emb.select(col("vec_id").as("nid"),
      col("embedding").as("v")), "v", model).drop("v")
    val q = emb.limit(3).select(col("vec_id").as("qid"),
      col("embedding").as("qvec"))
    val got = Pq.adcTopK(q, enc, model, 500)
      .as[(Long, Long, Double, Long)].collect()
      .map { case (a, b, s, _) => (a, b) -> s }.toMap
    val codes = enc.select(col("nid") +:
        (0 until 8).map(j => col(s"code_$j")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getInt)).toMap
    val qv = q.select(col("qid"),
        col("qvec").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    got.foreach { case ((a, b), s) =>
      val recon = codes(b).zipWithIndex.flatMap { case (c, j) =>
        model.centroids(j)(c) }
      val dot = qv(a).zip(recon).map { case (x, y) => x * y }.sum
      val want = math.floor(dot * 1e6 + 0.5) / 1e6
      assert(math.abs(s - want) < 1e-9, s"pair ($a,$b): adc $s vs $want")
    }
  }

  test("ADC top-5 recalls the exact cosine top-5 within the fixture bound") {
    // the honesty metric for the compression: PQ ranks by dot with the
    // RECONSTRUCTED vector, so recall against the exact top-k measures
    // pure quantization error. The fixture is ADVERSARIAL for PQ —
    // near-random embeddings whose top-5 cosine margins are thinner
    // than 4-bit codes resolve (measured mean recall 0.28 vs a chance
    // baseline of 5/499 ≈ 0.01, i.e. ~28× above chance; clustered
    // real-world embeddings sit far higher). Deterministic once
    // data+seed are fixed — the bound is a regression tripwire for
    // codebook/encode refactors, not a quality claim.
    val enc = Pq.encode(emb.select(col("vec_id").as("nid"),
      col("embedding").as("v")), "v", model).drop("v")
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val adc = Pq.adcTopK(q, enc, model, 5)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Similarity.cosineTopK(q,
        emb.select(col("vec_id").as("nid"), col("embedding").as("nvec")), 5)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, want) =>
      (adc.getOrElse(qid, Set.empty) & want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    val chance = 5.0 / 499.0
    assert(mean >= 0.2,
      f"mean recall@5 $mean%.3f collapsed — quantization broke ranking")
    assert(mean >= 10 * chance,
      f"mean recall@5 $mean%.3f is not meaningfully above chance")
  }

  test("save/load round-trips the codebooks exactly") {
    val path = java.nio.file.Files.createTempDirectory("pq").toString + "/m"
    model.save(spark, path)
    val back = Pq.load(spark, path)
    assert(back === model)
  }

  test("adcTopK excludes self, respects k, floors before ranking") {
    val enc = Pq.encode(emb.select(col("vec_id").as("nid"),
      col("embedding").as("v")), "v", model).drop("v")
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Pq.adcTopK(q, enc, model, 5)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.forall { case (a, b, _, _) => a != b })
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length === 5)
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1L to 5L))
      // rank order must follow (adc desc, nid asc) on the ROUNDED score
      sorted.sliding(2).foreach { case Array(x, y) =>
        assert(x._3 > y._3 || (x._3 == y._3 && x._2 < y._2))
      case _ => ()
      }
    }
  }
}
