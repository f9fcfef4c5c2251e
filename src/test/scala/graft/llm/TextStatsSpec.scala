package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens handle repeated/leading/trailing whitespace") {
    val out = Seq("  a  b c ").toDF("t")
      .select(TextStats.tokens(col("t"))).as[Seq[String]].head()
    assert(out === Seq("a", "b", "c"))
  }

  test("empty text: zero tokens, zero ratios") {
    val df = Seq("").toDF("t")
    assert(df.select(TextStats.tokenCount(col("t"))).as[Int].head() === 0)
    assert(df.select(TextStats.stopwordRatio(col("t"), Seq("the"))).as[Double].head() === 0.0)
    assert(df.select(TextStats.punctRatio(col("t"))).as[Double].head() === 0.0)
  }

  test("fingerprint is token-order-insensitive and case-insensitive") {
    val df = Seq(("World hello", "hello world"), ("a b", "a c")).toDF("x", "y")
    val out = df.select(
      (TextStats.fingerprint(col("x")) === TextStats.fingerprint(col("y"))))
      .as[Boolean].collect()
    assert(out.toSeq === Seq(true, false))
  }

  test("langId votes by marker stopwords; und when no evidence") {
    val df = Seq(
      "the cat is in the house and it is happy",
      "der hund ist nicht zu haus und das ist gut",
      "xyzzy plugh 12345").toDF("t")
    val out = df.select(TextStats.langId(col("t"))).as[String].collect()
    assert(out.toSeq === Seq("en", "de", "und"))
  }

  test("bpeish token count splits words and punctuation") {
    val out = Seq("don't stop, world!").toDF("t")
      .select(TextStats.bpeishTokenCount(col("t"))).as[Int].head()
    // don / ' / t / stop / , / world / ! -> 7
    assert(out === 7)
  }

  test("rolling fingerprint: shared long substrings share values; disjoint texts don't") {
    val common = "the quick brown fox jumps over the lazy dog"
    val df = Seq(
      ("a", s"PREFIX ONE $common SUFFIX ONE"),
      ("b", s"totally different beginning $common and another end"),
      ("c", "zzz qqq vvv kkk mmm nnn ppp rrr www yyy xxx")).toDF("k", "t")
    val fp = df.select(col("k"), TextStats.rollingFingerprint(col("t")).as("fp"))
      .as[(String, Seq[Long])].collect().toMap
    val shared = fp("a").toSet & fp("b").toSet
    assert(shared.nonEmpty, "docs sharing a 44-char substring must share fingerprints")
    assert((fp("a").toSet & fp("c").toSet).isEmpty)
    // deterministic and bounded: ~|doc|/w values
    assert(fp("a").length < 60)
  }

  test("rolling fingerprint short-doc and empty edge cases") {
    val out = Seq("", "ab", "exactly8").toDF("t")
      .select(TextStats.rollingFingerprint(col("t"))).as[Seq[Long]].collect()
    assert(out.forall(_.nonEmpty)) // always a non-empty deterministic signature
    assert(out(0) === Seq(0L))
  }

  test("quality score in [0,1]; longer diverse text scores higher than junk") {
    val df = Seq(
      ("good", (1 to 60).map(i => s"word$i").mkString(" ")),
      ("junk", "!!! ??? !!! ??? !!!")).toDF("k", "t")
    val m = df.select(col("k"), TextStats.qualityScore(col("t")))
      .as[(String, Double)].collect().toMap
    assert(m("good") > m("junk"))
    assert(m.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("stripMarkup: tags, script/style payloads, entities, whitespace") {
    val cases = Seq(
      // tags out, adjacent text separated by the injected space
      ("<p>hello</p><p>world</p>", "hello world"),
      // script/style PAYLOADS vanish entirely (code, not prose) — even
      // when the payload contains a tag inside a string literal
      ("a<script>var x = \"<p>\";</script>b", "a b"),
      ("x<style media=\"all\">p{}</style>y", "x y"),
      ("<SCRIPT>\nmulti\nline\n</SCRIPT>done", "done"),
      // entity decode, &amp; last: &amp;lt; -> literal &lt;
      ("&lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b &amp; &amp;lt;",
        "<tag> \"q\" 's' a b & &lt;"),
      // whitespace runs (incl. tabs/newlines/formfeed) collapse + trim
      ("  a\t\tb\n\nc\fd  ", "a b c d"),
      // plain text passes through
      ("already clean", "already clean"))
      .zipWithIndex.map { case ((in, want), i) => (i.toLong, in, want) }
      .toDF("id", "html", "want")
    val out = cases.select(col("id"),
        TextStats.stripMarkup(col("html")).as("got"), col("want"))
      .as[(Long, String, String)].collect()
    out.foreach { case (id, got, want) =>
      assert(got === want, s"case $id")
    }
    // null propagates
    val n = Seq((1L, (null: String))).toDF("id", "html")
      .select(TextStats.stripMarkup(col("html"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("nfc: composes decomposed forms, identity on NFC/ASCII, null-safe") {
    val cases = Seq(
      (0L, "cafe\u0301", "caf\u00e9"),            // e + combining acute
      (1L, "caf\u00e9", "caf\u00e9"),             // already composed
      (2L, "\u1100\u1161", "\uac00"),            // Hangul jamo L+V
      (3L, "plain ascii", "plain ascii"),
      (4L, "", ""))
      .toDF("id", "in", "want")
    val out = cases.select(col("id"), TextStats.nfc(col("in")).as("got"),
        col("want"))
      .as[(Long, String, String)].collect()
    out.foreach { case (id, got, want) => assert(got === want, s"case $id") }
    val n = Seq((1L, (null: String))).toDF("id", "t")
      .select(TextStats.nfc(col("t"))).collect()
    assert(n.head.isNullAt(0))
  }
}
