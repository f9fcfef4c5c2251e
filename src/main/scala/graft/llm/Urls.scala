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

  /** Staged parse: appends the [[Parsed]] components as `__uc_*` columns
    * through CHAINED PROJECTIONS, one attribute per step.
    *
    * Why this exists (measured, not theoretical): the Column DSL has no
    * let-binding — every reference to a Column value copies its whole
    * expression TREE into the plan. [[parse]] references its input ~5
    * times, `rest` references `u` twice, `pathQuery` references `rest`
    * twice, and so on — so a single-Column canonicalizer over a non-
    * trivial input expression builds a combinatorially large tree. On
    * the synthesized-URL bench queries this was a 13-22 MiB task binary
    * and 137-180 s per query; staged, the same queries run in well under
    * a second. Each stage here references only ATTRIBUTES of the
    * previous stage, and Catalyst's CollapseProject deliberately does
    * not re-inline an alias that is referenced more than once and is not
    * cheap, so the plan stays linear end to end. [[canonicalize]] and
    * [[host]] remain as single-Column conveniences for ATTRIBUTE or
    * literal inputs (specs, ad-hoc use); every DataFrame operator here
    * routes through the staged form. */
  private def staged(df: DataFrame, urlCol: String): DataFrame = {
    val u = col("__uc_u"); val rest = col("__uc_rest")
    val auth = col("__uc_auth"); val pq = col("__uc_pq")
    val hp = col("__uc_hp"); val port = col("__uc_port")
    df.withColumn("__uc_t", percentNormalize(trim(col(urlCol))))
      .withColumn("__uc_u", split(col("__uc_t"), "#", 2).getItem(0))
      .withColumn("__uc_valid", u.rlike(SchemeRe))
      .withColumn("__uc_scheme", lower(regexp_extract(u, SchemeRe, 1)))
      .withColumn("__uc_rest", substr(u, instr(u, "://") + 3, length(u)))
      .withColumn("__uc_auth", regexp_extract(rest, "^([^/?]*)", 1))
      .withColumn("__uc_pq",
        substr(rest, length(auth) + 1, length(rest)))
      .withColumn("__uc_path", split(pq, "\\?", 2).getItem(0))
      .withColumn("__uc_query", when(instr(pq, "?") > 0,
        substr(pq, instr(pq, "?") + 1, length(pq))))
      .withColumn("__uc_user", regexp_extract(auth, "^(.*@)?", 1))
      .withColumn("__uc_hp",
        substr(auth, length(col("__uc_user")) + 1, length(auth)))
      .withColumn("__uc_port", when(hp.rlike(":[0-9]*$"),
        regexp_extract(hp, ":([0-9]*)$", 1)))
      .withColumn("__uc_host", regexp_replace(lower(
        when(port.isNotNull,
          substr(hp, lit(1), length(hp) - length(port) - 1))
          .otherwise(hp)), "\\.$", ""))
      .withColumn("__uc_portc", {
        val defaultPort =
          (col("__uc_scheme") === "http" && port === "80") ||
          (col("__uc_scheme") === "https" && port === "443") ||
          (col("__uc_scheme") === "ftp" && port === "21")
        when(port.isNull || port === "" || defaultPort, lit(""))
          .otherwise(concat(lit(":"), port))
      })
      .withColumn("__uc_pathc",
        when(col("__uc_path") === "", lit("/")).otherwise(col("__uc_path")))
      .withColumn("__uc_kept", array_sort(filter(
        split(coalesce(col("__uc_query"), lit("")), "&", -1),
        p => {
          val name = split(p, "=", 2).getItem(0)
          p =!= "" && !name.startsWith("utm_") &&
            !name.isin(TrackingParams.map(x => x: Any): _*)
        })))
      .withColumn("__uc_queryc", when(size(col("__uc_kept")) > 0,
        concat(lit("?"), array_join(col("__uc_kept"), "&")))
        .otherwise(lit("")))
  }

  private val StagedCols: Seq[String] = Seq("__uc_t", "__uc_u",
    "__uc_valid", "__uc_scheme", "__uc_rest", "__uc_auth", "__uc_pq",
    "__uc_path", "__uc_query", "__uc_user", "__uc_hp", "__uc_port",
    "__uc_host", "__uc_portc", "__uc_pathc", "__uc_kept", "__uc_queryc")

  /** [[staged]] + the output column. `dropInvalid` filters on the CHEAP
    * `__uc_valid` stage INSTEAD of the caller filtering `out IS NOT
    * NULL` afterward: a post-hoc filter on the final alias is rewritten
    * by predicate pushdown, which substitutes the whole alias chain into
    * the pushed condition — the second face of the tree blowup [[staged]]
    * exists to prevent (measured: 244k optimized-plan expression nodes
    * from one IS NOT NULL, 33 MiB task binaries, ~2 min for a 5000-row
    * query). Filtering `__uc_valid` pushes only the ~50-node validity
    * subtree. Semantics are identical: `out` is NULL exactly when
    * `__uc_valid` is not true (invalid or NULL input). */
  private def stagedOut(df: DataFrame, urlCol: String, out: String,
                        outCol: DataFrame => Column,
                        dropInvalid: Boolean): DataFrame = {
    val s0 = staged(df, urlCol)
    val s1 = if (dropInvalid) s0.filter(col("__uc_valid")) else s0
    s1.withColumn(out, when(col("__uc_valid"), outCol(s1)))
      .drop(StagedCols: _*)
  }

  private def canonOut(df: DataFrame): Column =
    concat(col("__uc_scheme"), lit("://"), col("__uc_user"),
      col("__uc_host"), col("__uc_portc"), col("__uc_pathc"),
      col("__uc_queryc"))

  /** Staged [[canonicalize]]: appends `out` to `df` via chained linear
    * projections (see [[staged]]); the form every operator and query
    * uses. */
  def withCanonical(df: DataFrame, urlCol: String, out: String,
                    dropInvalid: Boolean = false): DataFrame =
    stagedOut(df, urlCol, out, canonOut, dropInvalid)

  /** Staged [[host]]: appends `out` to `df` (see [[staged]]). */
  def withHost(df: DataFrame, urlCol: String, out: String,
               dropInvalid: Boolean = false): DataFrame =
    stagedOut(df, urlCol, out, _ => col("__uc_host"), dropInvalid)

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
    * non-hierarchical or NULL input. Single-Column convenience — pass an
    * ATTRIBUTE (or literal), never a composite expression: the DSL
    * copies `url`'s whole tree at every internal reference (see
    * [[staged]]). Operators and queries use [[withCanonical]]. */
  def canonicalize(url: Column): Column = {
    val p = parse(url)
    when(p.valid, concat(p.scheme, lit("://"), p.userinfo, p.hostCanon,
      p.portCanon, p.pathCanon, p.queryCanon))
  }

  /** The canonical host of a URL (lowercased, DNS-root dot stripped,
    * userinfo/port removed) — the crawl-pipeline grouping key for host
    * budgets and blocklists. NULL for non-hierarchical input.
    * Single-Column convenience — same attribute-input caveat as
    * [[canonicalize]]; operators use [[withHost]]. */
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
    withHost(df.select(col(idCol).as("__id"), col(urlCol)), urlCol, "host",
        dropInvalid = true)
      .join(blocklist.select(col(blocklist.columns.head).as("host")),
        Seq("host"), "left_anti")
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"), min("__id").as("first_id"))

  /** RFC 9309 (Robots Exclusion Protocol) rule evaluation — the crawl
    * POLICY gate: before a URL is fetched (or before a crawl dump is
    * admitted into a training corpus), its path is checked against the
    * host's parsed robots rules. `rules` rows are (host, allow: Boolean,
    * pattern) where pattern is the RFC path pattern: literal prefix,
    * `*` wildcard, optional trailing `$` end anchor. Decision per URL:
    * among the host's rules whose pattern matches the path, the LONGEST
    * pattern wins (the RFC's most-specific-match), a length tie goes to
    * Allow; no matching rule (or no rules for the host) means allowed;
    * empty patterns match nothing (an empty Disallow means no
    * restriction, per the RFC).
    *
    * Shape: patterns compile to anchored regexes ON THE RULES SIDE (a
    * robots corpus is tiny next to a URL corpus), rules broadcast into
    * one equi-join on host, and the verdict is a max over
    * struct(pattern_length, allow) — struct ordering gives longest-then-
    * allow exactly, one shuffle on the URL id. Output: (id, host, path,
    * allowed). */
  def robotsAllowed(urls: DataFrame, idCol: String, hostCol: String,
                    pathCol: String, rules: DataFrame): DataFrame = {
    // pattern -> regex: strip a trailing $ (end anchor), escape regex
    // metachars EXCEPT '*', turn '*' into '.*', re-anchor
    val anchored = col("pattern").endsWith("$")
    val base = when(anchored,
      substr(col("pattern"), lit(1), length(col("pattern")) - 1))
      .otherwise(col("pattern"))
    val escaped = regexp_replace(base, "([.^+?(){}\\[\\]\\\\|$])", "\\\\$1")
    val rx = concat(lit("^"), replace(escaped, lit("*"), lit(".*")),
      when(anchored, lit("$")).otherwise(lit("")))
    val rulesRx = rules
      .filter(length(col("pattern")) > 0) // empty pattern matches nothing
      .select(col("host"), col("allow"), rx.as("__rx"),
        length(col("pattern")).as("__plen"))
    urls.select(col(idCol).as("__id"), col(hostCol).as("__host"),
        col(pathCol).as("__path"))
      .join(broadcast(rulesRx), col("__host") === col("host"), "left")
      .withColumn("__hit", col("__rx").isNotNull &&
        regexp_like(col("__path"), col("__rx")))
      .groupBy("__id", "__host", "__path")
      .agg(max(when(col("__hit"),
        struct(col("__plen"), col("allow")))).as("__best"))
      .select(col("__id").as(idCol), col("__host").as(hostCol),
        col("__path").as(pathCol),
        coalesce(col("__best.allow"), lit(true)).as("allowed"))
  }

  /** URL-level dedup: canonicalize `urlCol`, group, keep the minimum
    * `idCol` per canonical URL. Output: (url_canon, keeper_id, n_dups).
    * Rows whose URL canonicalizes to NULL (non-hierarchical) are dropped
    * — they have no well-defined identity to collapse on. One hash
    * shuffle on the canonical key; map-side combine does the counting. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    withCanonical(df.select(col(idCol), col(urlCol)), urlCol, "url_canon",
        dropInvalid = true)
      .select(col(idCol), col("url_canon"))
      .groupBy("url_canon")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))
}
