package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact below k; within 15% above k; merge across partitions") {
    // fewer distincts than k -> exact
    val small = spark.range(100).select((col("id") % 37).as("v"))
      .repartition(8)
    val exactSmall = small.agg(Sketches.kmvDistinct(col("v"), k = 256))
      .as[Long].head()
    assert(exactSmall === 37L)

    // 10k distincts, k=256 -> estimate within 15%
    val big = spark.range(50000).select((col("id") % 10000).as("v"))
      .repartition(16)
    val est = big.agg(Sketches.kmvDistinct(col("v"), k = 256)).as[Long].head()
    assert(math.abs(est - 10000.0) / 10000.0 < 0.15, s"estimate $est off >15%")
  }

  test("md5 hash mode: exact below k, sane estimate above k (oracle mode)") {
    val small = spark.range(100).select((col("id") % 37).as("v"))
      .repartition(8)
    assert(small.agg(Sketches.kmvDistinct(col("v"), 256, "md5"))
      .as[Long].head() === 37L)
    val big = spark.range(50000).select((col("id") % 10000).as("v"))
      .repartition(16)
    val est = big.agg(Sketches.kmvDistinct(col("v"), 256, "md5")).as[Long].head()
    assert(math.abs(est - 10000.0) / 10000.0 < 0.15, s"estimate $est off >15%")
  }

  test("deterministic across runs") {
    val df = spark.range(5000).select((col("id") % 999).as("v")).repartition(8)
    val a = df.agg(Sketches.kmvDistinct(col("v"))).as[Long].head()
    val b = df.agg(Sketches.kmvDistinct(col("v"))).as[Long].head()
    assert(a === b)
  }

  private val cmsParams = Seq(7919L -> 13L, 104729L -> 9973L,
    15485863L -> 3L, 32452843L -> 271L)

  private def cmsEstimate(sk: Seq[Long], h: Long, w: Int): Long =
    cmsParams.zipWithIndex.map { case ((a, b), i) =>
      sk(i * w + (((h * a + b) % 2147483647L) % w).toInt)
    }.min

  test("count-min: never underestimates, exact when collision-free") {
    val w = 512
    // 2000 hashed values: value v appears v%7+1 times
    val rows = (0 until 200).flatMap(v => Seq.fill(v % 7 + 1)(v.toLong * 1315423911L % 2147483647L))
    val df = rows.toDF("h").repartition(8)
    val sk = df.agg(Sketches.cms(col("h"), cmsParams, w)).head()
      .getSeq[Long](0)
    assert(sk.length === 4 * w)
    assert(sk.grouped(w).map(_.sum).toSeq === Seq.fill(4)(rows.size.toLong),
      "each hash row must count every input exactly once")
    (0 until 200).foreach { v =>
      val h = v.toLong * 1315423911L % 2147483647L
      val est = cmsEstimate(sk, h, w)
      assert(est >= v % 7 + 1, s"CMS underestimated value $v")
    }
    // a value never inserted can only read collisions, never negative
    assert(cmsEstimate(sk, 999999999L, w) >= 0)
  }

  test("count-min: bit-identical under different partitionings") {
    val df = spark.range(3000).select((col("id") % 777).as("h"))
    val a = df.repartition(2).agg(Sketches.cms(col("h"), cmsParams, 128))
      .head().getSeq[Long](0)
    val b = df.repartition(17).agg(Sketches.cms(col("h"), cmsParams, 128))
      .head().getSeq[Long](0)
    assert(a === b, "integer-add merge must be order-insensitive")
  }

  test("hll: estimate within 10% on 10k distinct; dup-insensitive") {
    // a REAL hash, as production uses: a multiplicative-congruential
    // sequence over sequential ids is low-discrepancy, not random, and
    // biases HLL's leading-zero ranks ~25% (measured)
    def h31(c: org.apache.spark.sql.Column) = shiftrightunsigned(
      call_function("md5_lower64", c.cast("string")), 33)
    val distinct = spark.range(10000).select(h31(col("id")).as("h"))
    val est = distinct.agg(Sketches.hllRegisters(col("h"), 8).as("sk"))
      .select(Sketches.hllEstimate(col("sk"), 8)).head().getDouble(0)
    assert(math.abs(est - 10000) / 10000.0 < 0.10, s"estimate $est")
    // duplicates must not move the registers at all
    val dup = spark.range(30000).select(h31(col("id") % 10000).as("h"))
    val est2 = dup.agg(Sketches.hllRegisters(col("h"), 8).as("sk"))
      .select(Sketches.hllEstimate(col("sk"), 8)).head().getDouble(0)
    assert(est2 === est)
  }

  test("kmvMins: set-operation estimates track known overlap; merge-stable") {
    // corpus A = 0..5999, corpus B = 4000..9999 -> union 10000,
    // intersection 2000, jaccard 0.2; md5 mode so estimates are
    // deterministic functions of the hash values
    def mins(df: org.apache.spark.sql.DataFrame) = df
      .agg(Sketches.kmvMins(col("v"), 256, "md5")).head().getSeq[Long](0)
    val a = mins(spark.range(0, 6000).select(col("id").as("v")))
    val b = mins(spark.range(4000, 10000).select(col("id").as("v")))
    assert(a.length === 256 && a === a.sorted && a.distinct.length === 256)
    val k = 256
    val x = (a ++ b).distinct.sorted.take(k)
    val u = x.last.toDouble / 1.8446744073709552e19 + 0.5
    val estUnion = math.floor((k - 1) / u + 0.5)
    assert(math.abs(estUnion - 10000) / 10000.0 < 0.15, s"union $estUnion")
    val rho = x.count(h => a.contains(h) && b.contains(h)).toDouble / x.length
    assert(math.abs(rho - 0.2) < 0.08, s"jaccard $rho")
    // bottom-k is partition-order insensitive
    val a2 = mins(spark.range(0, 6000).select(col("id").as("v"))
      .repartition(17))
    assert(a === a2)
  }

  test("histogram quantile: within one bin width of exact; clamps edges") {
    // uniform 0..999 over [0,1000)x100: every bin holds 10 values, the
    // p50 bin midpoint lands within one bin width (10) of the exact 499.5
    val df = spark.range(1000).select(col("id").cast("double").as("x"))
    val sk = df.agg(Sketches.histogram(col("x"), 0.0, 1000.0, 100).as("sk"))
    val p50 = sk.select(
      Sketches.histQuantile(col("sk"), 0.0, 1000.0, 100, 0.5)).head().getDouble(0)
    assert(math.abs(p50 - 499.5) <= 10.0, s"p50 $p50")
    val p90 = sk.select(
      Sketches.histQuantile(col("sk"), 0.0, 1000.0, 100, 0.9)).head().getDouble(0)
    assert(math.abs(p90 - 899.5) <= 10.0, s"p90 $p90")
    // out-of-range values clamp to the edge bins, never throw or drop
    val edge = spark.range(10)
      .select((col("id").cast("double") * 1e6 - 5e6).as("x"))
      .agg(Sketches.histogram(col("x"), 0.0, 1000.0, 100).as("sk"))
      .head().getSeq[Long](0)
    assert(edge.head + edge.last === 10L && edge.sum === 10L)
  }

  test("histKs: within the stated in-bin-mass bound of the exact KS") {
    // two deliberately drifted samples over [0,100)x50; the sketch KS
    // evaluates the sup at bin boundaries only, so the documented bound
    // is |KS_exact − KS_hist| <= max_mass/(nA·nB) — assert it, plus
    // exactness when every value sits ON a bin boundary
    def ksExact(a: Seq[Double], b: Seq[Double]): Double = {
      val xs = (a ++ b).distinct.sorted
      xs.map { x =>
        math.abs(a.count(_ <= x).toDouble / a.size -
          b.count(_ <= x).toDouble / b.size)
      }.max
    }
    val rnd = new scala.util.Random(42)
    val sa = Seq.fill(4000)(rnd.nextDouble() * 100.0)
    val sb = Seq.fill(3000)(math.pow(rnd.nextDouble(), 1.3) * 100.0)
    val df = sa.map(v => (v, "a")).union(sb.map(v => (v, "b")))
      .toDF("v", "side")
    val sk = df.groupBy(col("side"))
      .agg(Sketches.histogram(col("v"), 0.0, 100.0, 50).as("sk"))
    val row = sk.filter(col("side") === "a").select(col("sk").as("ska"))
      .crossJoin(sk.filter(col("side") === "b").select(col("sk").as("skb")))
      .select(Sketches.histKs(col("ska"), col("skb")).as("k"))
      .select(col("k.n_a"), col("k.n_b"), col("k.max_gap"),
        col("k.max_mass"), col("k.at_bin")).head()
    val (na, nb) = (row.getLong(0), row.getLong(1))
    assert(na === 4000L && nb === 3000L)
    val ksH = row.getLong(2).toDouble / (na * nb)
    val bound = row.getLong(3).toDouble / (na * nb)
    val ksE = ksExact(sa, sb)
    assert(math.abs(ksE - ksH) <= bound,
      s"|$ksE - $ksH| exceeds stated bound $bound")
    assert(ksH > 0.05, s"drifted samples must show a real gap, got $ksH")
    assert(row.getInt(4) >= 0 && row.getInt(4) < 50)
    // boundary-aligned values: the sketch sup IS the exact sup
    val ba = Seq(0.0, 2.0, 4.0, 6.0).map(v => (v, "a"))
    val bb = Seq(2.0, 4.0, 6.0, 8.0).map(v => (v, "b"))
    val sk2 = (ba ++ bb).toDF("v", "side").groupBy(col("side"))
      .agg(Sketches.histogram(col("v"), 0.0, 10.0, 5).as("sk"))
    val r2 = sk2.filter(col("side") === "a").select(col("sk").as("ska"))
      .crossJoin(sk2.filter(col("side") === "b").select(col("sk").as("skb")))
      .select(Sketches.histKs(col("ska"), col("skb")).as("k"))
      .select(col("k.max_gap"), col("k.n_a"), col("k.n_b")).head()
    assert(r2.getLong(0).toDouble / (r2.getLong(1) * r2.getLong(2))
      === ksExact(ba.map(_._1), bb.map(_._1)))
    // identical sketches: zero gap, at_bin = -1 sentinel
    val same = sk2.filter(col("side") === "a").select(col("sk").as("ska"))
    val r3 = same.crossJoin(same.select(col("ska").as("skb")))
      .select(Sketches.histKs(col("ska"), col("skb")).as("k"))
      .select(col("k.max_gap"), col("k.at_bin")).head()
    assert(r3.getLong(0) === 0L && r3.getInt(1) === -1)
  }

  test("histogram: NaN input fails fast, never inflates bin 0") {
    // floor(NaN).toInt == 0 would silently bin NaN at the low edge and
    // shift every quantile; the contract is fail-fast so callers filter
    // or impute upstream (isnan), like NULLs
    val df = Seq(1.0, 2.0, Double.NaN).toDF("x")
    val e = intercept[Exception](
      df.agg(Sketches.histogram(col("x"), 0.0, 10.0, 4)).head())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("NaN")), msgs(e).mkString("; "))
    // infinities are ordinary out-of-range values: clamp to edge bins
    val inf = Seq(Double.NegativeInfinity, Double.PositiveInfinity, 5.0)
      .toDF("x").agg(Sketches.histogram(col("x"), 0.0, 10.0, 4))
      .head().getSeq[Long](0)
    assert(inf === Seq(1L, 0L, 1L, 1L))
  }

  test("histogram: counts bit-identical under different partitionings") {
    val df = spark.range(5000).select(((col("id") * 7) % 997).cast("double").as("x"))
    val a = df.repartition(2).agg(Sketches.histogram(col("x"), 0.0, 997.0, 64))
      .head().getSeq[Long](0)
    val b = df.repartition(23).agg(Sketches.histogram(col("x"), 0.0, 997.0, 64))
      .head().getSeq[Long](0)
    assert(a === b, "integer-add merge must be order-insensitive")
    assert(a.sum === 5000L)
  }

  test("histMerge: merging per-group sketches == sketching the union") {
    val df = spark.range(6000).select((col("id") % 7).as("g"),
      ((col("id") * 13) % 997).cast("double").as("x"))
    val perGroup = df.groupBy("g")
      .agg(Sketches.histogram(col("x"), 0.0, 1000.0, 64).as("sk"))
    val merged = perGroup.agg(Sketches.histMerge(col("sk"), 64))
      .head().getSeq[Long](0)
    val direct = df.agg(Sketches.histogram(col("x"), 0.0, 1000.0, 64))
      .head().getSeq[Long](0)
    assert(merged === direct,
      "rollup by array-merge must equal a full rescan, bin for bin")
    assert(merged.sum === 6000L)
    // a mismatched grid is a loud error, never a silent mis-merge
    val e = intercept[Exception](perGroup
      .agg(Sketches.histMerge(col("sk"), 32)).head())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bins")), msgs(e).mkString("; "))
  }

  test("kmvMerge: merging per-group sketches == sketching the union") {
    val df = spark.range(9000).select((col("id") % 5).as("g"),
      (col("id") % 3000).as("v"))
    val perGroup = df.groupBy("g")
      .agg(Sketches.kmvMins(col("v"), 256, "md5").as("mins"))
    val merged = perGroup.agg(Sketches.kmvMerge(col("mins"), 256))
      .head().getSeq[Long](0)
    val direct = df.agg(Sketches.kmvMins(col("v"), 256, "md5"))
      .head().getSeq[Long](0)
    assert(merged === direct,
      "bottom-k of the union of bottom-ks must equal the union's bottom-k")
    assert(merged.size === 256 && merged === merged.sorted)
  }

  test("hllMerge: merging per-group registers == registers of the union") {
    // groups OVERLAP in keys (id % 3000 spans every g) — the case where
    // summing per-group distincts is wrong and register max is right
    val df = spark.range(9000).select((col("id") % 5).as("g"),
      shiftrightunsigned(
        call_function("md5_lower64", (col("id") % 3000).cast("string")), 33)
        .as("h"))
    val perGroup = df.groupBy("g")
      .agg(Sketches.hllRegisters(col("h"), 8).as("sk"))
    val merged = perGroup.agg(Sketches.hllMerge(col("sk"), 8))
      .head().getSeq[Long](0)
    val direct = df.agg(Sketches.hllRegisters(col("h"), 8))
      .head().getSeq[Long](0)
    assert(merged === direct,
      "elementwise-max rollup must equal registers built over the union")
    // a mismatched precision is a loud error, never a silent mis-merge
    val e = intercept[Exception](perGroup
      .agg(Sketches.hllMerge(col("sk"), 7)).head())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("registers")), msgs(e).mkString("; "))
  }

  test("misra-gries: exact when distinct keys fit; off stays 0") {
    // 30 distinct keys, k=64: no decrement can ever fire — the summary
    // IS the exact frequency table, under any partitioning
    val df = spark.range(3000)
      .select(concat(lit("k"), col("id") % 30).as("v"))
    for (p <- Seq(2, 17)) {
      val sk = df.repartition(p).agg(Sketches.heavyHitters(col("v"), 64))
        .head().getStruct(0)
      val keys = sk.getSeq[String](0)
      val counts = sk.getSeq[Long](1)
      assert(sk.getLong(2) === 0L, "no decrements below capacity")
      assert(keys.size === 30 && keys === keys.sorted)
      assert(counts.forall(_ === 100L))
    }
  }

  test("misra-gries: per-key bounds and membership guarantee on skew") {
    // Zipf-ish: key h0 half the stream, h1 a quarter, tail uniform over
    // 2000 cold keys; k=32 -> off <= N/(k+1), hot keys guaranteed in
    val n = 40000
    val rows = (0 until n).map { i =>
      if (i % 2 == 0) "h0" else if (i % 4 == 1) "h1" else s"c${i % 2000}"
    }
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = rows.toDF("v").repartition(8)
    val sk = df.agg(Sketches.heavyHitters(col("v"), 32)).head().getStruct(0)
    val keys = sk.getSeq[String](0)
    val counts = sk.getSeq[Long](1)
    val off = sk.getLong(2)
    assert(off <= n / 33 + 1, s"off $off beyond N/(k+1)")
    assert(keys.contains("h0") && keys.contains("h1"),
      "keys above N/(k+1) must be present")
    keys.indices.foreach { i =>
      val t = truth(keys(i))
      assert(counts(i) <= t && t <= counts(i) + off,
        s"${keys(i)}: count ${counts(i)} truth $t off $off")
    }
  }

  test("misra-gries merge: commutative, bounds survive any fold shape") {
    // property-style: random sub-streams sketched independently, merged
    // in several tree shapes; every shape must keep the MG bracket for
    // every surviving key, and commutativity must be exact
    val rnd = new scala.util.Random(7)
    val k = 16
    val streams = Seq.fill(6)(Seq.fill(800)(
      if (rnd.nextInt(3) == 0) "hot" else s"c${rnd.nextInt(300)}"))
    val truth = streams.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val n = streams.flatten.size
    def sketch(s: Seq[String]) =
      s.foldLeft((Vector.empty[String], Vector.empty[Long], 0L): Sketches.MgBuf)(
        new Sketches.MisraGries(k).reduce)
    val parts = streams.map(sketch)
    def check(buf: Sketches.MgBuf, label: String): Unit = {
      val (ks, cs, off) = buf
      assert(off <= n / (k + 1), s"$label: off $off")
      assert(ks.contains("hot"), s"$label: hot key lost")
      ks.indices.foreach { i =>
        val t = truth(ks(i))
        assert(cs(i) <= t && t <= cs(i) + off, s"$label ${ks(i)}")
      }
    }
    // left fold, right fold, pairwise tree
    check(parts.reduceLeft(Sketches.mgMerge(_, _, k)), "left")
    check(parts.reduceRight(Sketches.mgMerge(_, _, k)), "right")
    check(parts.grouped(2).map(g => g.reduce(Sketches.mgMerge(_, _, k)))
      .reduce(Sketches.mgMerge(_, _, k)), "tree")
    // exact commutativity of one merge
    val ab = Sketches.mgMerge(parts(0), parts(1), k)
    val ba = Sketches.mgMerge(parts(1), parts(0), k)
    assert(ab === ba, "merge must be commutative")
  }

  test("heavyHittersOrdered: deterministic, sorted, exact N") {
    val df = spark.range(5000)
      .select(concat(lit("t"), col("id") % 97).as("v")).repartition(8)
    val a = Sketches.heavyHittersOrdered(df, "v", 32)
    val b = Sketches.heavyHittersOrdered(df, "v", 32)
    assert(a === b, "pid-ordered fold must replay byte-identically")
    assert(a._3 === 5000L)
    val e = a._1
    assert(e === e.sortBy(h => (-h.count, h.key)), "hottest-first order")
  }

  test("hll: registers bit-identical under different partitionings") {
    val df = spark.range(5000).select(
      (col("id") * 48271L % 2147483647L).as("h"))
    val a = df.repartition(2).agg(Sketches.hllRegisters(col("h"), 8))
      .head().getSeq[Long](0)
    val b = df.repartition(23).agg(Sketches.hllRegisters(col("h"), 8))
      .head().getSeq[Long](0)
    assert(a === b, "max merge must be order-insensitive")
    assert(a.length === 256 && a.forall(r => r >= 0 && r <= 24))
  }
}
