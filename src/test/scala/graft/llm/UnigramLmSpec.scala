package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fit: MLE probs over ALL occurrences, deterministic top-K tie-break") {
    // counts: a=3, b=2, c=2, d=1 -> total 8; top-3 = a, then b,c (tie ->
    // lexicographic)
    val docs = Seq("a a a b b", "c c d").toDF("text")
    val v = UnigramLm.fit(docs, "text", vocabSize = 3)
      .as[(String, Double)].collect().toMap
    assert(v === Map("a" -> 3.0 / 8, "b" -> 2.0 / 8, "c" -> 2.0 / 8))
  }

  test("score: mean in-vocab probability, OOV contributes zero") {
    val corpus = Seq("a a a b b", "c c d").toDF("text")
    val v = UnigramLm.fit(corpus, "text", vocabSize = 3)
    val out = UnigramLm.score(
        Seq((1L, "a b"), (2L, "d d"), (3L, "a zz"), (4L, "   "))
          .toDF("doc_id", "text"),
        "doc_id", "text", v)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: (0.375 + 0.25)/2 = 0.3125; doc 2: d cut from vocab -> OOV
    assert(out(1L) === ((2L, 0L, 0.3125)))
    assert(out(2L) === ((2L, 2L, 0.0)))
    // doc 3: (0.375 + 0)/2 = 0.1875, one OOV
    assert(out(3L) === ((2L, 1L, 0.1875)))
    // doc 4: whitespace only -> zero tokens, score 0
    assert(out(4L) === ((0L, 0L, 0.0)))
  }

  test("fitBigrams: conditional p(w2|w1), top-K tie-break, denominator over all w1 uses") {
    // bigrams: "a a" x2, "a b" x2 (one per doc), "b a" x1;
    // unigrams a=5, b=2 -> p(a|a)=2/5, p(b|a)=2/5
    val docs = Seq("a a a b", "a b a").toDF("text")
    val v = UnigramLm.fitBigrams(docs, "text", vocabSize = 2)
      .as[(String, Double)].collect().toMap
    // top-2 by count: "a a"(2) and "a b"(2); "b a"(1) is cut
    assert(v === Map("a a" -> 0.4, "a b" -> 0.4))
  }

  test("scoreBigrams: mean conditional mass, short docs score zero") {
    val corpus = Seq("a a a b", "a b a").toDF("text")
    val m = UnigramLm.fitBigrams(corpus, "text", vocabSize = 2)
    val out = UnigramLm.scoreBigrams(
        Seq((1L, "a a b"), (2L, "b a"), (3L, "a"), (4L, null))
          .toDF("doc_id", "text").filter(col("text").isNotNull),
        "doc_id", "text", m)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: bigrams "a a","a b" -> (0.4+0.4)/2; doc 2: "b a" cut -> OOV
    assert(out(1L) === ((2L, 0L, 0.4)))
    assert(out(2L) === ((1L, 1L, 0.0)))
    assert(out(3L) === ((0L, 0L, 0.0)))
    assert(!out.contains(4L))
  }

  test("coverageVocab: smallest prefix reaching the target, exact boundary") {
    // counts: a=5, b=3, c=1, d=1 -> total 10. 90% target: a(5) short,
    // +b(8) short, +c(9) short (cum_before 8 < 9), +d enters? cum_before
    // 9 < 9 is FALSE -> d cut. Vocab = {a, b, c}.
    val docs = Seq("a a a a a b b b", "c d").toDF("text")
    val v = UnigramLm.coverageVocab(docs, "text", num = 9, den = 10)
      .as[String].collect().toSet
    assert(v === Set("a", "b", "c"))
    // 100% coverage keeps everything; 50%: a alone (cum_before 0 < 5,
    // then b: 5 < 5 false)
    assert(UnigramLm.coverageVocab(docs, "text", 1, 1)
      .as[String].collect().toSet === Set("a", "b", "c", "d"))
    assert(UnigramLm.coverageVocab(docs, "text", 1, 2)
      .as[String].collect().toSet === Set("a"))
  }

  test("coverageVocab tokenizes the corpus once (runtime exchange reuse)") {
    // the lazy one-row total must share the token-histogram exchange with
    // the main query — the eager head() shape this replaced ran the whole
    // scan->explode->groupBy twice, and nothing in the result would show it
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
    val v = UnigramLm.coverageVocab(docs, "text", num = 9, den = 10)
    v.collect()
    val ex = v.queryExecution.executedPlan.toString
    assert(ex.contains("ReusedQueryStage") || ex.contains("ReusedExchange"),
      s"no runtime exchange reuse in:\n$ex")
  }

  test("dsirWeights: likelihood ratio from one pass matches score twice") {
    val docs = Seq(
      (1L, "a a a b", "tgt"), (2L, "b b c", "tgt"),
      (3L, "c c c d d", "raw"), (4L, "a d", "raw"), (5L, "  ", "raw"))
      .toDF("doc_id", "text", "source")
    val tModel = UnigramLm.fit(docs.filter(col("source") === "tgt"), "text", 3)
    val rModel = UnigramLm.fit(docs, "text", 3)
    val out = UnigramLm.dsirWeights(docs, "doc_id", "text", tModel, rModel)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // the one-pass result must equal composing score() twice
    val tS = UnigramLm.score(docs, "doc_id", "text", tModel)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    val rS = UnigramLm.score(docs, "doc_id", "text", rModel)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    for (id <- 1L to 5L) {
      val (_, _, pt, pr, w) = out(id)
      assert(pt === tS(id), s"p_target doc $id")
      assert(pr === rS(id), s"p_raw doc $id")
      assert(w === math.floor(pt / (pr + 1e-6) * 1e6 + 0.5) / 1e6,
        s"ratio doc $id")
    }
    // target-like docs outweigh raw-only docs
    assert(out(1L)._5 > out(3L)._5)
    // whitespace doc: zero tokens, weight 0
    assert(out(5L)._2 === 0L && out(5L)._5 === 0.0)
  }

  test("qualityBuckets: exact terciles, ties land in the higher bucket") {
    // 6 distinct scores -> cuts at positions (n-1)/3 and 2(n-1)/3:
    // c1 between .2/.3 (interpolated 0.2666..), c2 between .4/.5 (.4666..)
    val scored = Seq(
      (1L, 0.1), (2L, 0.2), (3L, 0.3), (4L, 0.4), (5L, 0.5), (6L, 0.6))
      .toDF("doc_id", "mean_p")
    val out = UnigramLm.qualityBuckets(scored, "mean_p")
      .as[(Long, Double, String)].collect().map(r => r._1 -> r._3).toMap
    assert(out === Map(1L -> "tail", 2L -> "tail", 3L -> "middle",
      4L -> "middle", 5L -> "head", 6L -> "head"))
    // all-equal scores: both cuts equal the value, >= sends every row
    // to head — the documented tie rule, no empty-bucket surprises
    val flat = Seq((1L, 0.5), (2L, 0.5), (3L, 0.5)).toDF("doc_id", "mean_p")
    val fOut = UnigramLm.qualityBuckets(flat, "mean_p")
      .as[(Long, Double, String)].collect().map(_._3).toSet
    assert(fOut === Set("head"))
  }

  test("score ranks in-distribution text above gibberish on the fixture") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
    val v = UnigramLm.fit(docs, "text", vocabSize = 20)
    val scored = UnigramLm.score(docs.limit(50), "doc_id", "text", v)
    val meanReal = scored.agg(avg("mean_p")).head().getDouble(0)
    val gib = UnigramLm.score(
      Seq((1L, "qzx wvu plok mnbv")).toDF("doc_id", "text"),
      "doc_id", "text", v).head().getDouble(3)
    assert(meanReal > 0.01 && gib === 0.0,
      s"real=$meanReal gibberish=$gib")
  }

  test("fitClassVocab: per-class MLE with per-class top-K and tie-breaks") {
    val docs = Seq(
      ("x", "a a a b"), ("x", "b c"),       // x: a=3 b=2 c=1, total 6
      ("y", "d d e e")                      // y: d=2 e=2, total 4
    ).toDF("cls", "text")
    val m = UnigramLm.fitClassVocab(docs, "cls", "text", vocabSize = 2)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // x keeps a,b (c cut; total still counts it); y tie d/e -> lexicographic
    assert(m === Map(
      ("x", "a") -> 3.0 / 6, ("x", "b") -> 2.0 / 6,
      ("y", "d") -> 2.0 / 4, ("y", "e") -> 2.0 / 4))
  }

  test("routeByClass: argmax class, zero-hit and empty docs route deterministically") {
    val corpus = Seq(
      ("x", "a a a b"), ("x", "b c"),
      ("y", "d d e e")
    ).toDF("cls", "text")
    val m = UnigramLm.fitClassVocab(corpus, "cls", "text", vocabSize = 2)
    val out = UnigramLm.routeByClass(Seq(
        (1L, "a b"),     // x-mass (.5+.333)/2, y-mass 0 -> x
        (2L, "d e"),     // y
        (3L, "zz qq"),   // OOV everywhere: all masses 0 -> smallest cls = x
        (4L, "   ")      // empty: n_tokens 0 -> x
      ).toDF("doc_id", "text"), "doc_id", "text", m)
      .as[(Long, String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L)._1 === "x" && out(1L)._2 === 2L)
    assert(out(2L)._1 === "y")
    assert(out(3L) === (("x", 2L, 0.0)))
    assert(out(4L) === (("x", 0L, 0.0)))
    // winning mass quantization matches the integer-numerator discipline:
    // sum of floor(p*1e9+0.5) longs, then /1e9 /n_tokens, 1e-6 floor
    assert(out(1L)._3 === math.floor(
      (math.floor(3.0 / 6 * 1e9 + 0.5) +
        math.floor(2.0 / 6 * 1e9 + 0.5)) / 1e9 / 2 * 1e6 + 0.5) / 1e6)
  }

  test("vocabDrift: per-token gaps, absent-side zero, identical halves flat") {
    val a = Seq("a a a b").toDF("text")   // p: a=3/4, b=1/4
    val b = Seq("a c c c").toDF("text")   // p: a=1/4, c=3/4
    val out = UnigramLm.vocabDrift(a, b, "text", vocabSize = 2)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("a") === ((0.75, 0.25, 0.5)))
    assert(out("b") === ((0.25, 0.0, 0.25)))
    assert(out("c") === ((0.0, 0.75, 0.75)))
    // TV over the head = 0.5 * sum(delta)
    assert(out.values.map(_._3).sum / 2 === 0.75)
    val same = UnigramLm.vocabDrift(a, a, "text", vocabSize = 2)
      .as[(String, Double, Double, Double)].collect()
    assert(same.forall(_._4 === 0.0))
  }

  test("routeByClass: class-tied mass routes to lexicographically smallest") {
    val corpus = Seq(("x", "a a"), ("y", "a a")).toDF("cls", "text")
    val m = UnigramLm.fitClassVocab(corpus, "cls", "text", vocabSize = 1)
    val out = UnigramLm.routeByClass(
        Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text", m)
      .as[(Long, String, Long, Double)].collect().head
    assert(out._2 === "x" && out._4 === 1.0)
  }

  test("routeByClassMerged: supplementary-plane class labels tie-break " +
      "identically to the window sibling (UTF-8 vs UTF-16 order)") {
    // U+F000 (BMP private use) vs U+10000 (supplementary, surrogate pair
    // 𐀀). UTF-16 code-unit order: 0xD800 < 0xF000, so Scala's
    // String.compareTo sorts the supplementary label FIRST. Spark's
    // asc("cls") compares UTF8String bytes (= code points): U+F000 <
    // U+10000, the OPPOSITE. The two classes are given identical token
    // distributions so every routed doc is an exact mass tie and the
    // argmax is decided entirely by the class ordering — the sibling's
    // window picks U+F000; the merged form must too.
    val clsLo = ""          // code point 0xF000
    val clsHi = "𐀀"    // code point 0x10000
    val corpus = Seq((clsHi, "a a b"), (clsLo, "a a b")).toDF("cls", "text")
    val m = UnigramLm.fitClassVocab(corpus, "cls", "text", vocabSize = 2)
    val docs = Seq((1L, "a b"), (2L, "b"), (3L, "zz")).toDF("doc_id", "text")
    val sib = UnigramLm.routeByClass(docs, "doc_id", "text", m)
      .as[(Long, String, Long, Double)].collect().toSet
    val merged = UnigramLm.routeByClassMerged(docs, "doc_id", "text", m)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(sib.forall(_._2 === clsLo),
      s"window sibling must pick the UTF-8-smaller class, got $sib")
    assert(merged === sib,
      s"merged router diverged on supplementary-plane tie-break: " +
        s"merged=$merged sibling=$sib")
  }
}
