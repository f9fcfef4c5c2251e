package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: token
  * counting, quality ratios, content fingerprinting, language-ID heuristic.
  * All pure `functions._` compositions — codegen'd, no UDFs, so they run
  * at scan speed over 100 TB of documents.
  */
object TextStats {

  /** Whitespace tokens (single-space corpus; empty tokens removed so
    * multi-space/leading/trailing whitespace is robust). Native kernel
    * (graft.parse.TokensExpr) — the filter(split) composition evaluates its
    * lambda interpreted per token on every text operator. */
  def tokens(text: Column): Column = call_function("tokens_ws", text)

  /** Unicode NFC canonicalization (graft.parse.NfcExpr) — run BEFORE any
    * content-identity hash: composed and decomposed spellings of the
    * same text are byte-different until normalized. ASCII fast path. */
  def nfc(text: Column): Column = call_function("nfc", text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: counts alnum runs + individual non-alnum
    * non-space marks, the standard pre-tokenizer shape. One
    * regexp_extract_all pass (the lookaround-split formulation it replaces
    * ran the split regex at every char boundary plus an interpreted filter
    * lambda per piece). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val stops = call_function("count_in", toks,
      array(stopwords.map(lit): _*))
    when(size(toks) > 0, stops.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Ratio of non-alphanumeric-non-space chars to all chars. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", "")))
        .cast("double") / length(text).cast("double"))
      .otherwise(lit(0.0))

  /** Order-insensitive content fingerprint: md5 of the sorted, lowercased
    * token multiset. Two documents with the same bag of words collide —
    * the exact-dedup key. (md5 hex matches any engine for the oracle.) */
  def fingerprint(text: Column): Column =
    md5(to_binary(array_join(array_sort(tokens(lower(text))), " "), lit("utf-8")))

  /** Winnowed rolling-hash fingerprint (MOSS scheme, k=8 chars, window 4):
    * documents sharing a substring of length >= 11 chars share a
    * fingerprint value — substring-level copy detection, vs
    * [[fingerprint]]'s whole-document bag-of-words identity. Native kernel
    * graft.parse.RollingHashExpr; returns array<long>. */
  def rollingFingerprint(text: Column): Column =
    call_function("rolling_fingerprint", text)

  /** Simple quality score in [0,1]: penalizes very short docs, high
    * punctuation, low token diversity. Deterministic and monotone in its
    * inputs; thresholds follow common LLM-corpus heuristics (Gopher-style
    * length/symbol-ratio filters). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val lenScore = least(n.cast("double") / lit(50.0), lit(1.0))
    val divScore = when(n > 0,
      size(array_distinct(tokens(text))).cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    // floor-based rounding: deterministic across engines (see SparkEntry)
    floor((lenScore + divScore + punctScore) / 3.0 * 1e6 + 0.5) / 1e6
  }

  /** Language-ID by stopword evidence: score = hits per language marker set,
    * winner = max hits, ties alphabetical. A real n-gram profile model needs
    * training data this container lacks; marker-set voting is the classic
    * cheap heuristic and is fully relational (explode + join + max_by). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "les", "et", "un", "est", "que", "pour"),
    "zh" -> Seq("的", "了", "是", "我", "不"))

  def langIdScores(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = langMarkers.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((lang, ms), i) =>
        struct(
          call_function("count_in", toks, array(ms.map(lit): _*)).as("hits"),
          // negated index so max() breaks score ties toward the
          // alphabetically-first language
          lit(-i).as("nrank"),
          lit(lang).as("lang"))
    }
    array(scores: _*)
  }

  /** Best-guess language code; `und` when no marker hits at all. */
  def langId(text: Column): Column = {
    val best = array_max(langIdScores(text))
    when(best("hits") > 0, best("lang")).otherwise(lit("und"))
  }

  /** Web-corpus markup stripping — the text-extraction stage between a
    * crawl and every operator above (trafilatura-lite: a crawl's HTML is
    * noise until the tags, script/style payloads, and entities are
    * gone). One codegen'd projection — a fold of regexp_replace/replace
    * kernels, no UDF:
    *
    *   1. drop whole script/style ELEMENTS to a space (their text is
    *      code, not prose; a space so flanking prose never fuses) —
    *      non-greedy, case-insensitive, dot-matches-newline;
    *   2. strip remaining tags to a SPACE (adjacent text must not fuse);
    *   3. decode the core entities, `&amp;` LAST (single-pass decode:
    *      `&amp;lt;` must yield the literal `&lt;`, not `<`);
    *   4. collapse runs of the EXPLICIT class [ \t\n\r\f] (not `\s` —
    *      Java counts \x0B as \s, RE2 does not; the explicit class is
    *      the engine-portable subset) and trim.
    *
    * Every pattern stays in the Java-regex/RE2 common subset (no
    * lookaround, no backrefs), so an external engine replays the exact
    * fold — the q106 oracle does. NULL stays NULL (every kernel is
    * null-propagating in both engines). */
  def stripMarkup(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (e, r)) =>
      call_function("replace", c, lit(e), lit(r))
    }
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f]+", " "))
  }
}
