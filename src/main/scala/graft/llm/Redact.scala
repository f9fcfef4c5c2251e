package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and replace emails, URLs,
  * IPv4 addresses, and structured phone numbers with typed placeholder
  * tokens, reporting per-category match counts. A standard hygiene stage
  * before text lands in a training set.
  *
  * Pure codegen'd `regexp_replace`/`regexp_count` projections — stateless,
  * zero shuffles, embarrassingly parallel at any scale (the same posture
  * as [[Bpe.applyBpe]]). The patterns are deliberately RE2-compatible (no
  * lookaround, no backreferences) so an external SQL engine reproduces
  * the matches exactly — q78's oracle re-runs them in DuckDB.
  *
  * Order matters and is part of the contract: URL first (a URL may embed
  * an email-shaped or IP-shaped substring; the URL's replacement consumes
  * it), then email, then IPv4, then phone. SCOPE: the phone pattern
  * covers structured international forms (`+<cc>-<3>-<3..4>-<0..4>`),
  * not free-text national formats — broaden per deployment; false
  * positives on dash-joined numerics are the documented trade-off.
  */
object Redact {

  val UrlRe = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re =
    "\\b(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(\\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}\\b"
  val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{1,4})?"

  /** (category, pattern, placeholder), in application order. */
  val Rules: Seq[(String, String, String)] = Seq(
    ("url", UrlRe, "<URL>"),
    ("email", EmailRe, "<EMAIL>"),
    ("ip", Ipv4Re, "<IP>"),
    ("phone", PhoneRe, "<PHONE>"))

  /** Redacted text: every rule applied in order, all matches replaced. */
  def scrub(text: Column): Column =
    Rules.foldLeft(text) { case (c, (_, re, tok)) =>
      regexp_replace(c, re, tok)
    }

  /** Per-category match counts, measured at the stage the rule runs
    * (i.e. AFTER earlier rules' replacements — an email inside a URL
    * counts as url, not email, matching [[scrub]]'s output exactly). */
  def counts(text: Column): Seq[(String, Column)] = {
    var cur = text
    Rules.map { case (cat, re, tok) =>
      val n = regexp_count(cur, lit(re)).cast("long")
      cur = regexp_replace(cur, re, tok)
      cat -> n
    }
  }
}
