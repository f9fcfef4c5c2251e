package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-pipeline stage that runs BEFORE any
  * content dedup: the same page is fetched under `HTTP://WWW.Site.com:80`,
  * `http://www.site.com/?utm_source=tw`, and `http://www.site.com/#top`,
  * and URL-level dedup only collapses them if the key is canonical first.
  * Rules (RFC 3986 §6 syntax-based normalization plus the standard
  * tracking-parameter strip):
  *
  *   - percent-encoding normalization over the WHOLE string: `%XX`
  *     escapes of unreserved characters `[A-Za-z0-9._~-]` are decoded;
  *     all other escapes keep their `%` but uppercase the hex digits;
  *     malformed escapes (`%` not followed by two hex digits) pass
  *     through untouched. Decoding only unreserved characters can never
  *     materialize a delimiter (`#?&/=:@` are all reserved), so this
  *     pass is safe BEFORE structural parsing — one pass, no re-split;
  *   - fragment dropped (`#...` — client-side only, never sent);
  *   - scheme and host lowercased; a DNS-root trailing dot on the host
  *     dropped; userinfo preserved verbatim;
  *   - default ports dropped (http:80, https:443, ftp:21) and an empty
  *     `:` port always dropped;
  *   - empty path becomes `/`;
  *   - query: empty params dropped, tracking params dropped (`utm_*`
  *     prefix and the common click-id set), survivors SORTED byte-wise
  *     (param order is almost never semantic, and sorting canonicalizes
  *     `?a=1&b=2` vs `?b=2&a=1`); an emptied query drops its `?`.
  *
  * Non-hierarchical inputs (no `scheme://`) canonicalize to NULL —
  * `mailto:`/`javascript:`/garbage rows are filtered, not guessed at.
  * NULL propagates.
  *
  * Everything is built from codegen'd `functions._` Columns (split /
  * transform / array_sort / regexp_extract) — no UDF, no custom
  * expression needed; the whole operator is a stateless projection with
  * zero shuffles at any scale. Reference behavior: the reference keys its
  * entities on raw ids (feast-feature-store/feature-repo/entities.py);
  * URL keys are the crawl-corpus analogue (BASELINE.json LLM-ops scope).
  */
object Urls {

  /** Tracking parameters stripped by [[canonicalize]]: the `utm_*` family
    * by prefix plus the common cross-site click identifiers. */
  val TrackingParams: Seq[String] = Seq(
    "gclid", "fbclid", "msclkid", "yclid", "igshid",
    "mc_eid", "mkt_tok", "_hsenc", "_hsmi")

  /** Percent-encoding normalization (RFC 3986 §6.2.2.1-2): decode
    * escapes of unreserved chars, uppercase the hex of the rest, pass
    * malformed escapes through. Safe to apply to a full URL — see the
    * object doc. */
  def percentNormalize(u: Column): Column = {
    val pieces = split(u, "%", -1)
    val tail = slice(pieces, lit(2), greatest(size(pieces) - 1, lit(0)))
    val fixed = transform(tail, p => {
      val hex = substring(p, 1, 2)
      val ok = hex.rlike("^[0-9A-Fa-f]{2}$")
      // hex value without conv(): digit positions in the hex alphabet
      // (array_position is 1-based; the `ok` guard makes both hits sure)
      val hexChars = split(lit("0123456789abcdef"), "")
      val v = ((array_position(hexChars, lower(substring(p, 1, 1))) - 1) * 16
        + (array_position(hexChars, lower(substring(p, 2, 1))) - 1))
        .cast("int")
      val unreserved = v.between(48, 57) || v.between(65, 90) ||
        v.between(97, 122) || v.isin(45, 46, 95, 126)
      val rest = substr(p, lit(3), length(p))
      when(ok && unreserved, concat(chr(v), rest))
        .when(ok, concat(lit("%"), upper(hex), rest))
        .otherwise(concat(lit("%"), p))
    })
    concat(element_at(pieces, 1), array_join(fixed, ""))
  }

  /** Parsed, individually-canonicalized URL components (all Columns);
    * shared by [[canonicalize]] and [[host]]. */
  private final case class Parsed(valid: Column, scheme: Column,
                                  userinfo: Column, hostCanon: Column,
                                  portCanon: Column, pathCanon: Column,
                                  queryCanon: Column)

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  private def parse(url: Column): Parsed = {
    // percent-normalize FIRST (cannot create delimiters), then drop the
    // fragment, then parse scheme://authority/path?query
    val u = split(percentNormalize(trim(url)), "#", 2).getItem(0)
    val scheme = lower(regexp_extract(u, SchemeRe, 1))
    val rest = substr(u, instr(u, "://") + 3, length(u))
    val authority = regexp_extract(rest, "^([^/?]*)", 1)
    val pathQuery = substr(rest, length(authority) + 1, length(rest))
    val path = split(pathQuery, "\\?", 2).getItem(0)
    val query = when(instr(pathQuery, "?") > 0,
      substr(pathQuery, instr(pathQuery, "?") + 1, length(pathQuery)))
    // authority = [userinfo@]host[:port] — userinfo runs to the LAST '@'
    // (RFC 3986: host may not contain '@'); greedy (.*@)? finds it
    val userinfo = regexp_extract(authority, "^(.*@)?", 1)
    val hostPort = substr(authority, length(userinfo) + 1, length(authority))
    // trailing :digits (possibly empty) is the port; IPv6 literals end in
    // ']' so the anchor never eats into a bracketed address
    val port = when(hostPort.rlike(":[0-9]*$"),
      regexp_extract(hostPort, ":([0-9]*)$", 1))
    val host = when(port.isNotNull,
        substr(hostPort, lit(1), length(hostPort) - length(port) - 1))
      .otherwise(hostPort)
    val hostCanon = regexp_replace(lower(host), "\\.$", "")
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443") ||
      (scheme === "ftp" && port === "21")
    val portCanon = when(port.isNull || port === "" || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val pathCanon = when(path === "", lit("/")).otherwise(path)
    val kept = array_sort(filter(split(coalesce(query, lit("")), "&", -1),
      p => {
        val name = split(p, "=", 2).getItem(0)
        p =!= "" && !name.startsWith("utm_") &&
          !name.isin(TrackingParams.map(x => x: Any): _*)
      }))
    val queryCanon = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    Parsed(u.rlike(SchemeRe), scheme, userinfo, hostCanon, portCanon,
      pathCanon, queryCanon)
  }

  /** Canonicalize a URL column per the object doc; NULL for
    * non-hierarchical or NULL input. */
  def canonicalize(url: Column): Column = {
    val p = parse(url)
    when(p.valid, concat(p.scheme, lit("://"), p.userinfo, p.hostCanon,
      p.portCanon, p.pathCanon, p.queryCanon))
  }

  /** The canonical host of a URL (lowercased, DNS-root dot stripped,
    * userinfo/port removed) — the crawl-pipeline grouping key for host
    * budgets and blocklists. NULL for non-hierarchical input. */
  def host(url: Column): Column = {
    val p = parse(url)
    when(p.valid, p.hostCanon)
  }

  /** Per-host corpus audit behind a blocklist — the crawl-hygiene stage
    * that budgets and bans at host granularity (one spam host can
    * contribute millions of pages; quality work is usually spent
    * per-host before per-doc). Rows with a non-hierarchical URL are
    * dropped; blocklisted hosts leave via an anti join (a real blocklist
    * is tiny → AQE broadcasts it; a huge one still executes as a
    * shuffled anti join); counts are map-side combined on the host key —
    * one shuffle total. Output: (host, n_docs, first_id). */
  def hostStats(df: DataFrame, idCol: String, urlCol: String,
                blocklist: DataFrame): DataFrame =
    df.select(col(idCol).as("__id"), host(col(urlCol)).as("host"))
      .filter(col("host").isNotNull)
      .join(blocklist.select(col(blocklist.columns.head).as("host")),
        Seq("host"), "left_anti")
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"), min("__id").as("first_id"))

  /** URL-level dedup: canonicalize `urlCol`, group, keep the minimum
    * `idCol` per canonical URL. Output: (url_canon, keeper_id, n_dups).
    * Rows whose URL canonicalizes to NULL (non-hierarchical) are dropped
    * — they have no well-defined identity to collapse on. One hash
    * shuffle on the canonical key; map-side combine does the counting. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalize(col(urlCol)).as("url_canon"))
      .filter(col("url_canon").isNotNull)
      .groupBy("url_canon")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))
}
