package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QuantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quantize: endpoints exact, zero vector safe, int8 range") {
    val df = Seq(
      (1L, Seq(1f, -1f, 0.5f, 0f)),
      (2L, Seq(0f, 0f, 0f, 0f)),
      (3L, Seq(-0.25f, 0.125f, 0.0625f, -0.0625f))).toDF("id", "v")
    val got = df.select(col("id"), Quant.quantize(col("v")).as("q"))
      .as[(Long, Seq[Byte])].collect().toMap
    assert(got(1L) === Seq[Byte](127, -127, 64, 0))
    assert(got(2L) === Seq[Byte](0, 0, 0, 0))
    // max|x|=0.25: ratios -1, .5, .25, -.25 -> -127, 64, 32, -31
    // (floor(-31.75+0.5) = floor(-31.25) = -32? no: -0.25/0.25=-1? wait)
    assert(got(3L).head === -127.toByte)
    assert(got(3L).forall(b => b >= -127 && b <= 127))
  }

  test("scaleOf reconstructs magnitudes within quantization error") {
    val v = Seq(0.9f, -0.3f, 0.05f, 0.0f)
    val df = Seq(Tuple1(v)).toDF("v")
    val row = df.select(Quant.scaleOf(col("v")),
      Quant.quantize(col("v"))).head()
    val s = row.getDouble(0)
    val q = row.getSeq[Byte](1)
    v.zip(q).foreach { case (x, qi) =>
      assert(math.abs(qi * s - x) <= s / 2 + 1e-9,
        s"dequant error for $x: ${qi * s}")
    }
  }

  test("property: vec_dot_i kernel == HOF composition, incl null semantics") {
    val rnd = new scala.util.Random(41)
    val rows = (0 until 100).map { i =>
      (i.toLong, Seq.fill(16)((rnd.nextInt(255) - 127).toByte),
        Seq.fill(16)((rnd.nextInt(255) - 127).toByte))
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
        Quant.intDot(col("a"), col("b")).as("k"),
        Quant.intDotHof(col("a"), col("b")).as("h"))
      .filter(not(col("k") <=> col("h"))).count()
    assert(diff === 0L)
    // unequal lengths and null elements -> NULL on both paths
    val edge = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)))
      .toDF("a", "b")
    val rowsE = edge.select(Quant.intDot(col("a"), col("b")),
      Quant.intDotHof(col("a"), col("b"))).collect()
    rowsE.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1), r.toString))
  }

  test("quantized cosine approximates float cosine closely") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 40L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("nid", "nvec")
    val pairs = df.crossJoin(
        df.select(col("nid").as("mid"), col("nvec").as("mvec")))
      .filter(col("nid") < col("mid"))
      .select(
        Similarity.cosine(col("nvec"), col("mvec")).as("c"),
        Quant.cosineQ(Quant.quantize(col("nvec")),
          Quant.quantize(col("mvec"))).as("cq"))
      .as[(Double, Double)].collect()
    val maxErr = pairs.map { case (c, cq) => math.abs(c - cq) }.max
    assert(maxErr < 0.02, s"max |cos - cosQ| = $maxErr")
  }

  test("quantizedTopK matches float top-k almost everywhere (recall)") {
    val rnd = new scala.util.Random(29)
    val rows = (0L until 300L).map(i =>
      (i, Seq.fill(32)(rnd.nextGaussian().toFloat)))
    val corpus = rows.toDF("nid", "nvec")
    val qs = corpus.filter(col("nid") % 20 === 0)
      .select(col("nid").as("qid"), col("nvec").as("qvec"))
    val exact = Similarity.cosineTopK(qs, corpus, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val quant = Quant.quantizedTopK(qs, corpus, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall@5 = $recall")
  }
}
