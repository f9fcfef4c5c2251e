package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingles: k > token count falls back to whole-doc shingle") {
    val out = Seq("one two").toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("s")).as[Seq[String]].head()
    assert(out === Seq("one two"))
  }

  test("jaccard: identical sets -> 1.0, disjoint -> 0.0, both empty -> 1.0") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq.empty[String])).toDF("a", "b")
    val out = df.select(Dedup.jaccard(col("a"), col("b"))).as[Double].collect()
    assert(out.toSeq === Seq(1.0, 0.0, 1.0))
  }

  test("minhash LSH finds an exact duplicate pair and skips unrelated docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words about spark catalyst optimizer plans"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("simhash: identical docs -> hamming 0; different docs -> > 0") {
    val df = Seq(
      ("same text here", "same text here"),
      ("same text here", "totally other content words")).toDF("x", "y")
    val out = df.select(
      Dedup.hamming(Dedup.simhash(col("x")), Dedup.simhash(col("y"))))
      .as[Long].collect()
    assert(out(0) === 0L && out(1) > 0L)
  }

  test("banded simhash pairs == all-pairs ground truth, with no cross join") {
    // real fixture docs: the sf0.001 documents table has planted near-dups
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val radius = 8
    val banded = Dedup.simhashBandedPairs(docs, "doc_id", "text", radius)
    assert(!banded.queryExecution.executedPlan.toString.toLowerCase
      .matches("(?s).*(cartesian|broadcastnestedloop).*"),
      "banded path must not contain a cross/NLJ join")
    // exact all-pairs ground truth at the same radius (test-only harness)
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
    val truth = h.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(h.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", Dedup.hamming(col("sh_a"), col("sh_b")).cast("long"))
      .filter(col("hamming") <= radius)
      .select("id_a", "id_b", "hamming")
    val bs = banded.as[(Long, Long, Long)].collect().toSet
    val ts = truth.as[(Long, Long, Long)].collect().toSet
    assert(ts.nonEmpty, "fixture must contain at least one near-dup pair")
    assert(bs === ts, "pigeonhole banding must be lossless at radius <= bands-1")
  }

  test("banded simhash band widths partition all 64 bits (uneven radix)") {
    // radius 8 -> 9 bands: 64 = 8 + 7*8; a doc XOR-identical except in one
    // band must still be caught via any other band
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val out = Dedup.simhashBandedPairs(docs, "doc_id", "text", radius = 0)
    assert(out.as[(Long, Long, Long)].collect().toSeq === Seq((1L, 2L, 0L)))
  }

  test("prefix-filtered jaccard pairs == all-pairs ground truth, no cross join") {
    // fixture docs (planted near-dups) plus adversarial edges: an exact
    // J=4/5=0.8 boundary pair (the float-guard case: 0.8*5 rounds to
    // 4.0000000000000002, so a naive ceil-prefix or min>=t*max filter
    // drops it), identical docs, and an empty doc
    val extra = Seq(
      (9000001L, "alpha beta gamma delta"),
      (9000002L, "alpha beta gamma delta epsilon"),
      (9000003L, "zz yy xx ww vv"),
      (9000004L, "zz yy xx ww vv"),
      (9000005L, "")).toDF("doc_id", "text")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").union(extra)
    for (t <- Seq(0.8, 0.6)) {
      val fast = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        shingleK = 1, threshold = t)
      assert(!fast.queryExecution.executedPlan.toString.toLowerCase
        .matches("(?s).*(cartesian|broadcastnestedloop).*"),
        "prefix-filtered path must not contain a cross/NLJ join")
      val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleK = 1, threshold = t)
      val fs = fast.as[(Long, Long, Double)].collect().toSet
      val ts = truth.as[(Long, Long, Double)].collect().toSet
      assert(ts.exists(p => p._1 == 9000001L && p._2 == 9000002L),
        "boundary J=0.8 pair must qualify (float-guarded prefilter)")
      assert(fs === ts, s"prefix filtering must be lossless at t=$t")
    }
  }

  test("size-gated jaccardPairsAuto: both gate outcomes, identical pair set") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // force each side of the gate on the same input; the pair sets must
    // be byte-identical because the gate is a physical-plan choice only
    val small = Dedup.jaccardPairsAuto(docs, "doc_id", "text",
      shingleK = 1, threshold = 0.8, allPairsMax = Long.MaxValue)
    val large = Dedup.jaccardPairsAuto(docs, "doc_id", "text",
      shingleK = 1, threshold = 0.8, allPairsMax = 0)
    assert(!large.queryExecution.executedPlan.toString.toLowerCase
      .matches("(?s).*(cartesian|broadcastnestedloop).*"),
      "above the gate the plan must not contain a cross/NLJ join")
    val ss = small.as[(Long, Long, Double)].collect().toSet
    val ls = large.as[(Long, Long, Double)].collect().toSet
    assert(ss.nonEmpty && ss === ls)
  }

  test("gate boundary pinned: allPairsMax == n vs n-1, J=0.8 pair agrees on both paths") {
    def hasCross(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.toLowerCase
        .matches("(?s).*(cartesian|broadcastnestedloop).*")
    // fixture plus the exact J=4/5=0.8 threshold-boundary pair — BOTH
    // physical paths must keep it (the float-guard case: 0.8*5 rounds up
    // to 4.0000000000000002 in a naive prefilter)
    val extra = Seq(
      (9000001L, "alpha beta gamma delta"),
      (9000002L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").union(extra)
    val n = docs.count()
    // gate semantics are <= cap: cap == n stays all-pairs, cap == n-1
    // tips to prefix — pin both sides of the boundary by plan shape
    val atGate = Dedup.jaccardPairsAuto(docs, "doc_id", "text",
      shingleK = 1, threshold = 0.8, allPairsMax = n)
    val overGate = Dedup.jaccardPairsAuto(docs, "doc_id", "text",
      shingleK = 1, threshold = 0.8, allPairsMax = n - 1)
    assert(hasCross(atGate), "cap == n must choose the all-pairs plan")
    assert(!hasCross(overGate), "cap == n-1 must choose the prefix plan")
    val as = atGate.as[(Long, Long, Double)].collect().toSet
    val os = overGate.as[(Long, Long, Double)].collect().toSet
    assert(as.exists(p => p._1 == 9000001L && p._2 == 9000002L),
      "threshold-boundary pair must survive the all-pairs path")
    assert(as === os, "both gate outcomes must agree at the boundary")
  }

  test("contaminationPairs flags the planted overlap, spares clean docs, no cross join") {
    // doc 1 embeds bench 100's 8-token text verbatim -> all six of its
    // 3-grams shared; doc 2 shares nothing; doc 3 is a SHORT doc (< k
    // tokens, whole-doc-shingle fallback) exactly equal to short bench 101
    val docs = Seq(
      (1L, "intro words the quick brown fox jumps over lazy dogs outro tail"),
      (2L, "completely unrelated content about catalyst optimizer rules"),
      (3L, "tiny doc")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over lazy dogs"),
      (101L, "tiny doc")).toDF("bench_id", "bench_text")
    val out = Dedup.contaminationPairs(docs, "doc_id", "text",
      bench, "bench_id", "bench_text", shingleK = 3, minShared = 5)
    assert(!out.queryExecution.executedPlan.toString.toLowerCase
      .matches("(?s).*(cartesian|broadcastnestedloop).*"))
    val pairs = out.select("doc", "bench_doc", "shared")
      .as[(Long, Long, Long)].collect().toSet
    // doc 1 x bench 100: 3-grams of the shared 8-token run "the quick
    // brown fox jumps over lazy dogs" = 6 shared shingles >= 5
    assert(pairs.map(p => (p._1, p._2)) === Set((1L, 100L)))
    assert(pairs.head._3 === 6L)
    // the short-doc fallback matches only on exact text equality
    val short = Dedup.contaminationPairs(docs, "doc_id", "text",
      bench, "bench_id", "bench_text", shingleK = 3, minShared = 1)
      .select("doc", "bench_doc").as[(Long, Long)].collect().toSet
    assert(short.contains((3L, 101L)))
    assert(!short.exists(_._1 == 2L))
  }

  test("removeContaminatedSpans: excises covered spans, merges overlaps, keeps sub-k docs") {
    val docs = Seq(
      (1L, "a b c d e f"),       // hits at pos 0,1,2 -> covered 0..4
      (2L, "x a b c d y"),       // two overlapping hits -> covered 1..4
      (3L, "clean words only here"),
      (4L, "c d e"),             // fully covered -> empty survivor
      (5L, "c d"),               // sub-k: bench substring but NO k-gram
      (6L, "   ")).toDF("doc_id", "text")
    val bench = Seq("c d e", "a b c d").toDF("bench_text")
    val out = Dedup.removeContaminatedSpans(
        docs, "doc_id", "text", bench, "bench_text", k = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: "c d e"@2 plus the bench 4-token run's "a b c"@0 and
    // "b c d"@1 -> covered {0..4}, only the tail token survives
    assert(out(1L) === ((6L, 5L, "f")))
    // doc 2: bench 4-token "a b c d" contributes 3-grams "a b c" and
    // "b c d"; hits at pos 1 and 2 -> covered {1,2,3,4} -> "x y"
    assert(out(2L) === ((6L, 4L, "x y")))
    assert(out(3L) === ((4L, 0L, "clean words only here")))
    assert(out(4L) === ((3L, 3L, "")))
    assert(out(5L) === ((2L, 0L, "c d")))
    assert(out(6L) === ((0L, 0L, "")))
  }

  test("selfSubstringScrub: min-id doc keeps each duplicated span, others lose it") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high"),   // keeper of "the quick brown"
      (2L, "see the quick brown fox here"),     // loses the shared span
      (3L, "the quick brown cat sits"),         // shares only a 2-gram prefix run
      (4L, "totally unrelated words right now"),
      (5L, "see the quick brown fox here")      // exact dup of 2 -> scrubbed too
    ).toDF("doc_id", "text")
    val out = Dedup.selfSubstringScrub(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // windows in >=2 docs: "the quick brown" (docs 1,2,3,5; keeper 1),
    // "quick brown fox" (1,2,5; keeper 1), "see the quick" (2,5; keeper
    // 2), "the quick brown"... doc 2's full text is docs {2,5}'s shared
    // windows plus doc 1's -> doc 2 keeps what it is keeper of
    assert(out(1L) === ((6L, 0L, "the quick brown fox jumps high")))
    // doc 2 is keeper of the windows it shares ONLY with doc 5
    // ("see the quick", "brown fox here", ...), but loses the two
    // windows doc 1 holds: positions 1..2 -> covered 1..4 -> "see here"
    assert(out(2L) === ((6L, 4L, "see here")))
    // doc 3: only "the quick brown"@0 is duplicated -> covered 0..2
    assert(out(3L) === ((5L, 3L, "cat sits")))
    assert(out(4L) === ((5L, 0L, "totally unrelated words right now")))
    // doc 5: every window it holds is also in doc 1 or kept by doc 2 ->
    // fully covered
    assert(out(5L) === ((6L, 6L, "")))
  }

  test("selfSubstringScrub equals a brute-force reference on random corpora") {
    val rnd = new scala.util.Random(17)
    val vocab = Array("a", "b", "c", "d")
    for (trial <- 0 until 3) {
      val k = 2 + trial % 2
      val docs = (1L to 12L).map { id =>
        val n = rnd.nextInt(14)
        id -> (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")
      }
      // brute force: window -> (keeper, docs); covered positions per doc
      val windows = docs.flatMap { case (id, t) =>
        val toks = t.split(" ").filter(_.nonEmpty)
        (0 to toks.length - k).map(p => (toks.slice(p, p + k).mkString(" "), id, p))
      }
      val byText = windows.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2)
      val keeperOf = byText.map { case (sh, occ) => sh -> occ.map(_._2).min }
      val expected = docs.map { case (id, t) =>
        val toks = t.split(" ").filter(_.nonEmpty)
        val covered = (0 to toks.length - k).flatMap { p =>
          val sh = toks.slice(p, p + k).mkString(" ")
          if (keeperOf.get(sh).exists(_ != id)) p until p + k else Seq.empty
        }.toSet
        val kept = toks.zipWithIndex.collect {
          case (tk, i) if !covered(i) => tk
        }
        id -> ((toks.length.toLong, covered.size.toLong, kept.mkString(" ")))
      }.toMap
      val out = Dedup.selfSubstringScrub(
          docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      docs.foreach { case (id, t) =>
        assert(out(id) === expected(id), s"trial $trial k=$k doc $id '$t'")
      }
    }
  }

  test("selfSubstringScrub: the doc-frequency cap spares corpus-wide boilerplate") {
    val docs = Seq(
      (1L, "subscribe to our newsletter for weekly updates"),
      (2L, "subscribe to our newsletter today friends"),
      (3L, "subscribe to our newsletter please people"),
      (4L, "subscribe to our newsletter for weekly updates")) // dup of 1
      .toDF("doc_id", "text")
    val out = Dedup.selfSubstringScrub(docs, "doc_id", "text", k = 4,
        maxShingleDocFreq = Some(3L))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._3).toMap
    // "subscribe to our newsletter" rides all 4 docs -> above the cap,
    // spared everywhere; doc 4's remaining windows (df 2) still cut
    assert(out(1L) === 0L && out(2L) === 0L && out(3L) === 0L)
    assert(out(4L) > 0L)
  }

  test("removeContaminatedSpans: the hot-shingle cap spares boilerplate, still cuts rare leakage") {
    // "terms of service apply" rides every doc AND the benchmark; only
    // doc 1 additionally leaks the benchmark's rare "secret eval answer"
    val docs = Seq(
      (1L, "terms of service apply secret eval answer end"),
      (2L, "terms of service apply normal content here"),
      (3L, "terms of service apply other words too")).toDF("doc_id", "text")
    val bench = Seq("terms of service apply secret eval answer")
      .toDF("bench_text")
    val capped = Dedup.removeContaminatedSpans(
        docs, "doc_id", "text", bench, "bench_text", k = 3,
        maxShingleDocFreq = Some(2L))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    // doc-frequency > 2 kills the boilerplate 3-grams ("terms of
    // service", "of service apply"); doc 1's rare grams ("service apply
    // secret" @2 ... "secret eval answer" @4) still cover 2..6
    assert(capped(1L) === ((5L, "terms of end")))
    assert(capped(2L)._1 === 0L && capped(3L)._1 === 0L)
    // uncapped, the boilerplate prefix is cut from every doc: doc 1's
    // hits @0..4 cover 0..6, only the 8th token survives
    val raw = Dedup.removeContaminatedSpans(
        docs, "doc_id", "text", bench, "bench_text", k = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(raw(1L) === 7L && raw(2L) > 0L && raw(3L) > 0L)
  }

  test("contaminationPairs: the hot-shingle cap drops boilerplate buckets") {
    // every doc shares the boilerplate run; only doc 1 shares RARE grams
    // with the benchmark beyond it
    val boiler = "all rights reserved by the example corporation footer"
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $boiler"),
      (2L, s"one two three four five six $boiler"),
      (3L, s"seven eight nine ten eleven twelve $boiler")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, s"alpha beta gamma delta epsilon zeta $boiler"))
      .toDF("bench_id", "bench_text")
    val uncapped = Dedup.contaminationPairs(docs, "doc_id", "text",
      bench, "bench_id", "bench_text", shingleK = 3, minShared = 1)
      .select("doc").as[Long].collect().toSet
    assert(uncapped === Set(1L, 2L, 3L)) // boilerplate flags everyone
    val capped = Dedup.contaminationPairs(docs, "doc_id", "text",
      bench, "bench_id", "bench_text", shingleK = 3, minShared = 1,
      maxShingleDocFreq = Some(2L))
      .select("doc").as[Long].collect().toSet
    assert(capped === Set(1L)) // only the genuine overlap survives
  }

  test("caller-supplied docCount skips the gating count and is honored") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // cap 0 with claimed count 0: 0 <= 0 chooses all-pairs even though the
    // real corpus is larger — plan shape proves docCount preempted count()
    val forced = Dedup.jaccardPairsAuto(docs, "doc_id", "text",
      shingleK = 1, threshold = 0.8, allPairsMax = 0, docCount = 0)
    assert(forced.queryExecution.executedPlan.toString.toLowerCase
      .matches("(?s).*(cartesian|broadcastnestedloop).*"))
  }

  test("malformed allPairsMax conf surfaces a clear error") {
    spark.conf.set("spark.graft.dedup.allPairsMax", "not-a-number")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.jaccardPairsAuto(
          spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
          "doc_id", "text", shingleK = 1, threshold = 0.8)
      }
      assert(e.getMessage.contains("spark.graft.dedup.allPairsMax"))
    } finally spark.conf.unset("spark.graft.dedup.allPairsMax")
  }

  test("md5 token hash matches DuckDB md5_number_lower bit-for-bit") {
    // pinned against `SELECT md5_number_lower('abc'), md5_number_lower('')`
    // run in DuckDB: bytes 8..15 of the digest, little-endian
    import org.apache.spark.unsafe.types.UTF8String
    assert(graft.parse.Md5Hash.lower64(UTF8String.fromString("abc"))
      === 8250560606382298838L)
    assert(graft.parse.Md5Hash.lower64(UTF8String.fromString(""))
      === java.lang.Long.parseUnsignedLong("9098107892288553193"))
    assert(graft.parse.Md5Hash.base31(UTF8String.fromString("abc"))
      === (8250560606382298838L >>> 33))
  }

  test("banded simhash in md5 mode == all-pairs ground truth (oracle mode)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val radius = 6
    val banded = Dedup.simhashBandedPairs(docs, "doc_id", "text", radius,
      hashMode = "md5")
    val h = docs.select(col("doc_id"),
      Dedup.simhash(col("text"), "md5").as("sh"))
    val truth = h.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(h.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", Dedup.hamming(col("sh_a"), col("sh_b")).cast("long"))
      .filter(col("hamming") <= radius)
      .select("id_a", "id_b", "hamming")
    val bs = banded.as[(Long, Long, Long)].collect().toSet
    val ts = truth.as[(Long, Long, Long)].collect().toSet
    assert(ts.nonEmpty, "fixture must contain at least one md5-mode pair")
    assert(bs === ts)
  }

  test("minhash LSH in md5 mode still finds the planted duplicate pair") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words about spark catalyst optimizer plans"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.9,
      hashMode = "md5")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("minhash signature is deterministic across evaluations") {
    val df = Seq("alpha beta gamma delta epsilon zeta").toDF("t")
      .select(Dedup.shingles(col("t"), 2).as("s"))
    val s1 = df.select(Dedup.minhashSignature(col("s"), 8)).as[Seq[Long]].head()
    val s2 = df.select(Dedup.minhashSignature(col("s"), 8)).as[Seq[Long]].head()
    assert(s1 === s2 && s1.length === 8)
  }

  test("shingle kernel is identical to the HOF composition on fixtures") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .union(Seq("", "one two", "  padded   spaces  ", "a a a a a").toDF("text"))
    for (k <- Seq(1, 3, 50)) {
      val both = docs.select(
        Dedup.shingles(col("text"), k).as("kern"),
        Dedup.shinglesHof(col("text"), k).as("hof"))
      assert(both.filter(not(col("kern") === col("hof"))).isEmpty,
        s"kernel and HOF shingles must agree (k=$k), incl. order")
    }
  }

  test("minhash kernel is bit-identical to the HOF composition on fixtures") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
      .select(Dedup.shingles(col("text"), 3).as("s"))
    val both = docs.select(
      Dedup.minhashSignature(col("s"), 32).as("k"),
      Dedup.minhashSignatureHof(col("s"), 32).as("h"))
    assert(both.filter(not(col("k") === col("h"))).isEmpty,
      "kernel and HOF signatures must agree on every doc")
  }

  test("minhash kernel matches the HOF on null-bearing shingle arrays") {
    // Spark's hash(NULL) is the seed (42) and participates in every
    // permutation minimum in the HOF — the kernel must not skip nulls
    val df = Seq(Seq[Option[String]](Some("tok"), None),
      Seq[Option[String]](None)).toDF("s")
    val both = df.select(
      Dedup.minhashSignature(col("s"), 8).as("k"),
      Dedup.minhashSignatureHof(col("s"), 8).as("h"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (k, h) => assert(k === h) }
  }

  test("keepBest: best score wins per component, ties to min id, singletons self") {
    val spark2 = spark
    import spark2.implicits._
    // component {1,2,3} (chain), component {10,11}, singleton 20
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.5), // best is 2
      (10L, 0.7), (11L, 0.7),          // tie -> min id 10
      (20L, 0.1)).toDF("doc_id", "q")
    val out = Dedup.keepBest(docs, "doc_id", "q", pairs, "id_a", "id_b")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((1L, 2L)) && out(2L) === ((1L, 2L)) &&
      out(3L) === ((1L, 2L)))
    assert(out(10L) === ((10L, 10L)) && out(11L) === ((10L, 10L)))
    assert(out(20L) === ((20L, 20L)))
  }

  test("crossGroupOverlap: hand-computed Jaccard, zero-overlap pairs kept") {
    // k=2 shingle sets: x = {"a b","b c"} from "a b c"; y = {"a b"} (short
    // doc fallback is the whole doc); z = {"q r"} — disjoint from both
    val docs = Seq(
      ("x", "a b c"), ("y", "a b"), ("z", "q r")
    ).toDF("source", "text")
    val out = Dedup.crossGroupOverlap(docs, "source", "text", k = 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out.keySet === Set(("x", "y"), ("x", "z"), ("y", "z")))
    // |x|=2, |y|=1, inter=1 -> j = 1/2
    assert(out(("x", "y")) === ((2L, 1L, 1L, 0.5)))
    assert(out(("x", "z")) === ((2L, 1L, 0L, 0.0)))
    assert(out(("y", "z")) === ((1L, 1L, 0L, 0.0)))
  }

  test("snapshotDiff: added/removed/changed/unchanged incl. null text") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, (null: String)),
      (4L, "d"), (5L, (null: String))).toDF("doc_id", "text")
    val nw = Seq((1L, "a"), (2L, "B"), (3L, (null: String)),
      (5L, "now set"), (6L, "new")).toDF("doc_id", "text")
    val out = Dedup.snapshotDiff(old, nw, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "changed", 6L -> "added"))
  }

  test("crossGroupOverlap: within-group duplicate shingles count once") {
    val docs = Seq(
      ("x", "a b a b"), ("x", "a b"), ("y", "a b")
    ).toDF("source", "text")
    val out = Dedup.crossGroupOverlap(docs, "source", "text", k = 2)
      .as[(String, String, Long, Long, Long, Double)].collect().head
    // x's distinct 2-shingles: {"a b","b a"}; y's: {"a b"}
    assert(out === (("x", "y", 2L, 1L, 1L, 0.5)))
  }
}
