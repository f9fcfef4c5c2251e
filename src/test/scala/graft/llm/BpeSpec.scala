package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent textbook apply: per word, each learned rule in order,
    * left-to-right non-overlapping merges over a symbol list. The Spark
    * path under test computes the SAME thing through the bracketed
    * replace-fold encoding — the encoding is what this spec checks. */
  private def naiveApply(word: String,
                         rules: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.split("").filter(_.nonEmpty).toSeq
    for ((a, b) <- rules) {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms
  }

  private def naiveDoc(text: String, m: Bpe.Merges): String =
    text.toLowerCase.replaceAll("[\\[\\]]", "").split(" ")
      .filter(_.nonEmpty)
      .flatMap(w => naiveApply(w, m.rules)).mkString(" ")

  test("fit learns the classic most-frequent-pair merges, deterministically") {
    // 'aaab' x4 + 'ab' x2: pair counts round 1: (a,a)=8, (a,b)=6 -> merge
    // (a,a); round 2: (aa,a)=4, (aa,b)... wait: aaab -> [aa, a, b]:
    // (aa,a)=4, (a,b)=4+2=6 -> tie-free merge (a,b); round 3: aaab ->
    // [aa, ab]: (aa,ab)=4 -> merge
    val docs = Seq.fill(4)("aaab").mkString(" ") + " " +
      Seq.fill(2)("ab").mkString(" ")
    val m = Bpe.fit(Seq(docs).toDF("text"), "text", numMerges = 3)
    assert(m.rules === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("applyBpe equals the textbook implementation on the fixture corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
    val m = Bpe.fit(docs, "text", numMerges = 48)
    assert(m.rules.size === 48)
    val got = docs.select(col("doc_id"),
        Bpe.applyBpe(col("text"), m).as("toks"))
      .as[(Long, String)].collect().toMap
    val want = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> naiveDoc(t, m) }.toMap
    assert(got.size === want.size)
    val bad = want.keys.filter(k => got(k) != want(k))
    assert(bad.isEmpty,
      s"${bad.size} docs diverge, e.g. ${bad.headOption.map(k => s"$k: got='${got(k)}' want='${want(k)}'")}")
  }

  test("property: random short words, adversarial overlap shapes") {
    val rnd = new scala.util.Random(5)
    val alpha = "abc"
    val wordsList = (Seq("aaaa", "abab", "aabb", "bbaa", "ababa", "aaab") ++
      Seq.fill(200)((0 until (1 + rnd.nextInt(8)))
        .map(_ => alpha(rnd.nextInt(3))).mkString)).distinct
    val docs = wordsList.grouped(5).map(_.mkString(" ")).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val m = Bpe.fit(df, "text", numMerges = 12)
    val got = df.select(col("doc_id"), Bpe.applyBpe(col("text"), m))
      .as[(Long, String)].collect().toMap
    docs.foreach { case (id, t) =>
      assert(got(id) === naiveDoc(t, m), s"doc $id '$t'")
    }
  }

  test("reconstruction: tokens concatenate back to the normalized words") {
    val df = Seq((1L, "The Quick [brown] fox"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val m = Bpe.Merges(Seq(("t", "h"), ("th", "e"), ("q", "u")))
    val got = df.select(col("doc_id"), Bpe.applyBpe(col("text"), m))
      .as[(Long, String)].collect().toMap
    assert(got(1L).replace(" ", "") === "thequickbrownfox")
    assert(got(2L) === "" && got(3L) === "")
    // token count agrees with the flat split
    val n = df.select(col("doc_id"), Bpe.tokenCount(col("text"), m))
      .as[(Long, Long)].collect().toMap
    assert(n(1L) === got(1L).split(" ").length.toLong && n(2L) === 0L)
  }

  test("kernel apply equals the replace-fold SPEC on random text + merges") {
    // the fold is what the q76 oracle replays; the kernel must be the
    // identical function on arbitrary input: brackets (stripped by the
    // shared sanitize), unicode INCLUDING supplementary-plane code
    // points (one emoji = ONE symbol, never two sheared surrogates),
    // case, whitespace runs, empties, and NULL (both null-propagate)
    val rnd = new scala.util.Random(42)
    val alphabet: IndexedSeq[String] =
      "abcde é日[ ]A".map(_.toString) :+ "😀" :+ "😀"
    val docs = (0 until 60).map { i =>
      val len = rnd.nextInt(40)
      (i.toLong, (0 until len)
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    } :+ (60L -> null.asInstanceOf[String])
    val df = docs.toDF("doc_id", "text")
    for (nm <- Seq(0, 1, 7, 32)) {
      val m = Bpe.fit(df.filter(col("text").isNotNull), "text",
        numMerges = nm)
      val both = df.select(col("doc_id"),
          Bpe.applyBpe(col("text"), m).as("kernel"),
          Bpe.applyBpeFold(col("text"), m).as("fold"))
        .collect()
      both.foreach { r =>
        val (id, k, f) = (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(2)) null else r.getString(2))
        assert(k === f, s"numMerges=$nm doc $id: kernel '$k' != fold '$f'")
        if (id == 60L) assert(k == null, "NULL must propagate")
      }
    }
  }
}
