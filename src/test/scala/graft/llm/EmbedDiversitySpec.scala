package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q255's moment identity Σ_{i≠j} u_i·u_j = ‖Σu‖² − Σ‖u_i‖² must equal
  * the brute-force O(n²) pairwise mean EXACTLY on the 1e-6 grid, and the
  * statistic must be non-vacuous: planted duplicates read ≈1, orthogonal
  * sets read 0, antipodal sets read −1/(n−1). */
class EmbedDiversitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16

  private def unit(i: Int): Array[Float] = {
    val a = new Array[Float](dim); a(i % dim) = 1f; a
  }
  private def mixed(i: Int): Array[Float] = {
    // deterministic non-axis unit-ish vectors (normalized downstream)
    val a = Array.tabulate(dim)(j => (((i * 31 + j * 17) % 13) - 6).toFloat)
    if (a.forall(_ == 0f)) a(0) = 1f
    a
  }

  private def fixture = {
    val dup = Seq.fill(40)(("dup", mixed(7)))
    val orth = (0 until dim).map(i => ("orth", unit(i)))
    val anti = (0 until 20).flatMap { _ => Seq.empty } ++
      (0 until 10).flatMap(i =>
        Seq(("anti", unit(3)), ("anti", unit(3).map(-_))))
    val mix = (0 until 50).map(i => ("mix", mixed(i)))
    (dup ++ orth ++ anti ++ mix).toDF("label", "embedding")
  }

  /** the q255 pipeline on an in-memory frame */
  private def identityMeans: Map[String, Double] = {
    val d38 = "decimal(38,0)"
    val v = fixture
      .withColumn("nrm", Similarity.l2Norm(col("embedding")))
      .filter(col("nrm") > 0)
      .withColumn("u6", expr(
        "transform(embedding, x -> CAST(FLOOR(x / nrm * 1e6 + 0.5)" +
          " AS BIGINT))"))
      .withColumn("usq", expr(
        "aggregate(u6, CAST(0 AS BIGINT), (a, x) -> a + x * x)"))
    val perClass = v.groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("usq").cast(d38)).as("un"))
    val ssq = v.select(col("label"), posexplode(col("u6")))
      .groupBy(col("label"), col("pos")).agg(sum(col("col")).as("s6"))
      .groupBy(col("label"))
      .agg(sum(col("s6").cast(d38) * col("s6").cast(d38)).as("ssq"))
    perClass.join(ssq, Seq("label"))
      .select(col("label"),
        ((col("ssq") - col("un")).cast("double") /
          (col("n").cast("double") * (col("n") - 1).cast("double")) /
          1e12).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  /** brute force over the SAME grid-normalized integer vectors */
  private def bruteMeans: Map[String, Double] = {
    val rows = fixture.collect().map { r =>
      val v = r.getSeq[Float](1).toArray
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum)
      (r.getString(0),
        v.map(x => math.floor(x / nrm * 1e6 + 0.5).toLong))
    }
    rows.groupBy(_._1).map { case (lbl, vs) =>
      val us = vs.map(_._2)
      val n = us.length
      var s = 0.0
      for (i <- us.indices; j <- us.indices if i != j)
        s += us(i).zip(us(j)).map { case (a, b) => a.toDouble * b }.sum
      lbl -> s / (n.toDouble * (n - 1)) / 1e12
    }
  }

  test("identity equals brute force exactly; planted structure detected") {
    val idm = identityMeans
    val bf = bruteMeans
    for ((lbl, m) <- bf)
      assert(math.abs(idm(lbl) - m) < 1e-12, s"$lbl: ${idm(lbl)} vs $m")
    assert(idm("dup") > 0.999, s"duplicates must read ~1: ${idm("dup")}")
    assert(math.abs(idm("orth")) < 1e-9, s"orthogonal must read 0")
    assert(math.abs(idm("anti") - (-1.0 / 19)) < 1e-6,
      s"antipodal must read −1/(n−1): ${idm("anti")}")
  }
}
