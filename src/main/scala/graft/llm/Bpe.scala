package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding: REAL merge-rule learning and application — the
  * tokenizer half of token counting ([[TextStats.tokenCount]] counts
  * whitespace words; this produces the subword ids a trainer actually
  * consumes). Classic BPE (Sennrich et al. 2016, public algorithm):
  *
  *  - [[fit]]: words -> character symbols; `numMerges` times, merge the
  *    most frequent adjacent symbol pair. Trained on the distributed word
  *    HISTOGRAM (one `groupBy(word).count` shuffle — map-side combined),
  *    with the greedy merge loop on the driver over that histogram: the
  *    histogram is vocabulary-sized, not corpus-sized, which is how BPE
  *    training works everywhere (the corpus contributes only word counts).
  *
  *  - [[applyBpe]]: apply the learned merges IN LEARNED ORDER to each
  *    word. Ordered single-pass application is exactly classic BPE apply:
  *    merge k's pair can only contain symbols produced by merges < k, so
  *    an earlier pair can never become newly applicable after a later one.
  *
  * The apply encoding is the whole trick: a word becomes one bracketed
  * symbol per char (`the` -> `[t][h][e]`), and merge (a,b)->ab is the
  * plain string replacement `[a][b]` -> `[ab]`. Left-to-right
  * non-overlapping replacement on this encoding IS the BPE merge (the
  * per-symbol brackets make cross-symbol and mid-symbol matches
  * impossible, and adjacent occurrences share no characters so one pass
  * replaces them all). That keeps apply a single codegen'd projection —
  * a fold of `replace` kernels, no UDF, no per-row interpreter — and
  * makes the operator externally recomputable: the q76 oracle replays the
  * same replace fold in SQL (recursive CTE over the merge list). Words
  * are separated by a space the patterns cannot span; no end-of-word
  * marker (the simpler public BPE flavor — merges never cross words
  * either way).
  *
  * Normalization (both engines, documented contract): lowercase,
  * whitespace-split non-empty words, and the bracket characters `[`/`]`
  * are STRIPPED from input (they are the encoding's reserved symbols).
  *
  * 100 TB posture: fit is one shuffle + a driver loop over the (capped)
  * vocabulary; apply is a stateless projection — embarrassingly parallel,
  * no shuffle at all. The merge table rides the plan as literals
  * (numMerges small strings), like the IVF centroids.
  */
object Bpe {

  /** Ordered merge rules; position = learned rank. */
  final case class Merges(rules: Seq[(String, String)])

  private def sanitize(text: Column): Column =
    regexp_replace(lower(text), "[\\[\\]]", "")

  private[llm] def words(text: Column): Column =
    filter(split(sanitize(text), " "), w => length(w) > 0)

  /** Learn `numMerges` merge rules from the corpus's word histogram.
    * Deterministic: ties on pair count break toward the lexicographically
    * smallest pair. `maxVocabWords` caps the driver-side histogram (top
    * by count, ties by word) — the standard training corpus cap. */
  def fit(docs: DataFrame, text: String, numMerges: Int,
          maxVocabWords: Int = 50000): Merges = {
    val hist = docs.select(explode(words(col(text))).as("w"))
      .groupBy("w").count()
      .orderBy(desc("count"), asc("w"))
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Array[(Array[String], Long)] =
      hist.map { case (w, c) => (w.split("").filter(_.nonEmpty), c) }
    val rules = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        rules += best
        val (a, b) = best
        vocab = vocab.map { case (syms, c) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), c)
        }
        k += 1
      }
    }
    Merges(rules.result())
  }

  /** Tokenize `text` with the learned merges: returns the space-joined
    * BPE token sequence (flat across words, classic output shape). ONE
    * codegen'd kernel pass (graft.parse.BpeApplyExpr): per word, the
    * textbook ordered symbol-merge loop — O(rules x word symbols) over
    * the raw text, vs the replace-fold's `rules.size` full-string scans
    * of a 3x bracketed encoding. The fold ([[applyBpeFold]]) remains the
    * cross-engine SPECIFICATION — the q76 oracle replays it as a
    * recursive CTE — and BpeSpec property-tests kernel == fold on
    * random text under random fitted merge tables. */
  def applyBpe(text: Column, merges: Merges): Column =
    call_function("bpe_apply", sanitize(text),
      array(merges.rules.map(r => lit(r._1)): _*),
      array(merges.rules.map(r => lit(r._2)): _*))

  /** The replace-fold formulation — the oracle-replayable reference
    * [[applyBpe]] is property-tested against. A word becomes one
    * bracketed symbol per char and each merge is a plain string
    * replacement (see the object scaladoc). */
  private[llm] def applyBpeFold(text: Column, merges: Merges): Column = {
    // per word: one bracketed symbol per char -> [t][h][e]
    val bracketed = transform(words(text),
      w => array_join(transform(split(w, ""), c => concat(lit("["), c, lit("]"))), ""))
    val doc = array_join(bracketed, " ")
    // merges in learned order: [a][b] -> [ab]
    val merged = merges.rules.foldLeft(doc) { case (s, (a, b)) =>
      call_function("replace", s, lit(s"[$a][$b]"), lit(s"[$a$b]"))
    }
    // strip the encoding: word spaces out, symbol boundaries to spaces
    val flat = call_function("replace",
      call_function("replace", merged, lit("] ["), lit("][")),
      lit("]["), lit(" "))
    // NULL propagates (kernel contract: nullSafeEval); '' stays ''
    when(length(flat) > 0,
      call_function("replace",
        call_function("replace", flat, lit("["), lit("")),
        lit("]"), lit("")))
      .when(flat.isNotNull, lit(""))
  }

  /** BPE token count under the merges — `size(split)` on the flat form.
    * NULL text -> NULL count (applyBpe null-propagates, so the
    * `when`/`split`/`size` chain does too). */
  def tokenCount(text: Column, merges: Merges): Column = {
    val t = applyBpe(text, merges)
    when(length(t) === 0, lit(0L))
      .otherwise(size(split(t, " ")).cast("long"))
  }
}
