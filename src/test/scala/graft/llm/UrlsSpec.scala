package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UrlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: Seq[String]): Seq[Option[String]] = {
    val df = urls.zipWithIndex.map { case (u, i) => (i, u) }.toDF("i", "u")
    df.select(col("i"), Urls.canonicalize(col("u")).as("c"))
      .orderBy("i").collect().toSeq
      .map(r => Option(r.getString(1)))
  }

  // ---- independent scanning reference implementation -------------------

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def refPercent(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        val unreserved = (v >= 48 && v <= 57) || (v >= 65 && v <= 90) ||
          (v >= 97 && v <= 122) || v == 45 || v == 46 || v == 95 || v == 126
        if (unreserved) sb.append(v.toChar)
        else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def refCanon(url: String): Option[String] = {
    if (url == null) return None
    val u = refPercent(url.trim).split("#", 2)(0)
    val m = "^([A-Za-z][A-Za-z0-9+.-]*)://".r.findFirstMatchIn(u)
    if (m.isEmpty) return None
    val scheme = m.get.group(1).toLowerCase
    val rest = u.substring(u.indexOf("://") + 3)
    val cut = rest.indexWhere(c => c == '/' || c == '?')
    val (authority, pathQuery) =
      if (cut < 0) (rest, "") else (rest.take(cut), rest.drop(cut))
    val qi = pathQuery.indexOf('?')
    val (path, query) =
      if (qi < 0) (pathQuery, None)
      else (pathQuery.take(qi), Some(pathQuery.drop(qi + 1)))
    val ai = authority.lastIndexOf('@')
    val userinfo = if (ai < 0) "" else authority.take(ai + 1)
    val hostPort = authority.drop(ai + 1)
    val pm = ":([0-9]*)$".r.findFirstMatchIn(hostPort)
    val port = pm.map(_.group(1))
    val host = pm.map(x => hostPort.take(x.start)).getOrElse(hostPort)
    val hostCanon = host.toLowerCase.replaceAll("\\.$", "")
    val defaultPort = port.exists(p =>
      (scheme == "http" && p == "80") || (scheme == "https" && p == "443") ||
        (scheme == "ftp" && p == "21"))
    val portCanon =
      if (port.isEmpty || port.contains("") || defaultPort) ""
      else ":" + port.get
    val pathCanon = if (path.isEmpty) "/" else path
    val kept = query.map(_.split("&", -1).toSeq).getOrElse(Seq.empty)
      .filter { p =>
        val name = p.split("=", 2)(0)
        p.nonEmpty && !name.startsWith("utm_") &&
          !Urls.TrackingParams.contains(name)
      }.sorted
    val queryCanon = if (kept.isEmpty) "" else "?" + kept.mkString("&")
    Some(scheme + "://" + userinfo + hostCanon + portCanon + pathCanon +
      queryCanon)
  }

  // ---- hand-picked adversarial cases -----------------------------------

  test("scheme/host case, default port, fragment, empty path") {
    assert(canon(Seq("HTTP://WWW.Example.COM:80/Path#frag")) ===
      Seq(Some("http://www.example.com/Path")))
    assert(canon(Seq("https://Host.Org:443")) ===
      Seq(Some("https://host.org/")))
    assert(canon(Seq("https://Host.Org:8443")) ===
      Seq(Some("https://host.org:8443/")))
    // :80 is only default for http; an empty : port always drops
    assert(canon(Seq("https://h.co:80/", "http://h.co:/x")) ===
      Seq(Some("https://h.co:80/"), Some("http://h.co/x")))
    assert(canon(Seq("ftp://F.co:21/f")) === Seq(Some("ftp://f.co/f")))
  }

  test("tracking params drop, survivors sort, emptied query drops its ?") {
    assert(canon(Seq("http://h.co/p?utm_source=a&b=2&a=1&gclid=xyz")) ===
      Seq(Some("http://h.co/p?a=1&b=2")))
    assert(canon(Seq("http://h.co/p?utm_campaign=x&fbclid=1")) ===
      Seq(Some("http://h.co/p")))
    // empty params drop; duplicate names survive sorted; ? with no query
    assert(canon(Seq("http://h.co/p?&&y=2&y=1&", "http://h.co/p?")) ===
      Seq(Some("http://h.co/p?y=1&y=2"), Some("http://h.co/p")))
    // query on an empty path still forces the / before the ?
    assert(canon(Seq("http://H.co?b=1&a=2")) ===
      Seq(Some("http://h.co/?a=2&b=1")))
  }

  test("percent normalization: decode unreserved, uppercase the rest") {
    assert(canon(Seq("http://h.co/%41%62%7e-%2f%3a")) ===
      Seq(Some("http://h.co/Ab~-%2F%3A")))
    // malformed escapes pass through: bad hex, truncated, bare %
    assert(canon(Seq("http://h.co/%zz%4", "http://h.co/a%")) ===
      Seq(Some("http://h.co/%zz%4"), Some("http://h.co/a%")))
    // %%41: first % malformed, second decodes
    assert(canon(Seq("http://h.co/%%41")) === Seq(Some("http://h.co/%A")))
    // decoding never creates a delimiter: %23/%26/%3F stay encoded
    assert(canon(Seq("http://h.co/a%23b?x=%26&y=%3f")) ===
      Seq(Some("http://h.co/a%23b?x=%26&y=%3F")))
  }

  test("userinfo, IPv6 literals, trailing host dot, whitespace") {
    assert(canon(Seq("  http://User@Host.co/p  ")) ===
      Seq(Some("http://User@host.co/p")))
    // userinfo runs to the LAST @
    assert(canon(Seq("http://a@b@Host.co/")) ===
      Seq(Some("http://a@b@host.co/")))
    assert(canon(Seq("http://[::1]:8080/x", "http://[::A]/x")) ===
      Seq(Some("http://[::1]:8080/x"), Some("http://[::a]/x")))
    assert(canon(Seq("http://example.com./p")) ===
      Seq(Some("http://example.com/p")))
  }

  test("non-hierarchical and null inputs canonicalize to NULL") {
    assert(canon(Seq("mailto:a@b.co", "javascript:alert(1)", "no scheme",
      "://missing", "")) === Seq(None, None, None, None, None))
    val df = Seq(Tuple1(Option.empty[String])).toDF("u")
    assert(df.select(Urls.canonicalize(col("u"))).head().isNullAt(0))
  }

  test("property: Column canonicalize == scanning reference, 600 URLs") {
    val rnd = new scala.util.Random(42)
    val schemes = Seq("http", "HTTP", "https", "Ftp", "wss", "mailto:x", "")
    val hosts = Seq("Example.COM", "a.b.C.", "[::1]", "x", "10.0.0.1")
    val ports = Seq("", ":80", ":443", ":21", ":8080", ":", ":0080")
    val paths = Seq("", "/", "/A/b", "/%41%7e", "/%zz%", "/a%2Fb%3a", "//x")
    val queries = Seq("", "?", "?a=1", "?utm_source=x&b=2&a=3",
      "?gclid=1&z=%41", "?b&&a=", "?y=2&y=1&x")
    val frags = Seq("", "#f", "#a#b", "#%41")
    val urls = Seq.fill(600) {
      def pick(xs: Seq[String]) = xs(rnd.nextInt(xs.size))
      val sep = if (rnd.nextBoolean()) "://" else ":/"
      pick(schemes) + sep + pick(hosts) + pick(ports) + pick(paths) +
        pick(queries) + pick(frags) + (if (rnd.nextBoolean()) " " else "")
    }
    val got = canon(urls)
    urls.zip(got).foreach { case (u, g) =>
      assert(g === refCanon(u), s"divergence on <$u>")
    }
  }

  test("host: canonical host only — no userinfo, port, case, root dot") {
    val df = Seq("HTTP://u:p@WWW.Example.COM.:8080/a?b=1#f",
      "https://[::1]:443/x", "mailto:a@b.co").toDF("u")
    assert(df.select(Urls.host(col("u"))).collect().toSeq.map(r =>
      Option(r.getString(0))) ===
      Seq(Some("www.example.com"), Some("[::1]"), None))
  }

  test("hostStats: blocklist anti join, counts, min id; invalid dropped") {
    val docs = Seq((1L, "http://A.co/x"), (2L, "https://a.CO:443/y"),
      (3L, "http://spam.co/z"), (4L, "junk"), (5L, "http://b.co/"))
      .toDF("id", "url")
    val out = Urls.hostStats(docs, "id", "url",
        Seq("spam.co").toDF("host"))
      .orderBy("host").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out === Seq(("a.co", 2L, 1L), ("b.co", 1L, 5L)))
  }

  test("robotsAllowed: RFC 9309 longest-match, tie->allow, defaults") {
    val rules = Seq(
      ("h", false, "/admin"), ("h", true, "/admin/public"),
      ("h", false, "/*.x$"), ("h", true, "/a"), ("h", false, "/a"),
      ("h", false, "")).toDF("host", "allow", "pattern")
    val urls = Seq(
      (1L, "h", "/admin/secret"),     // Disallow /admin
      (2L, "h", "/admin/public/ok"),  // Allow beats shorter Disallow
      (3L, "h", "/deep/file.x"),      // wildcard + end anchor
      (4L, "h", "/deep/file.xy"),     // anchor does NOT match
      (5L, "h", "/a"),                // exact tie /a vs /a -> Allow wins
      (6L, "h", "/elsewhere"),        // no matching rule -> allowed
      (7L, "other", "/admin")         // rule-less host -> allowed
    ).toDF("id", "host", "path")
    val out = Urls.robotsAllowed(urls, "id", "host", "path", rules)
      .orderBy("id").collect().toSeq.map(r => (r.getLong(0), r.getBoolean(3)))
    assert(out === Seq(1L -> false, 2L -> true, 3L -> false, 4L -> true,
      5L -> true, 6L -> true, 7L -> true))
  }

  test("robotsAllowed: regex metachars in patterns are literal") {
    val rules = Seq(("h", false, "/a.b"), ("h", false, "/c(d)")).
      toDF("host", "allow", "pattern")
    val urls = Seq((1L, "h", "/a.b"), (2L, "h", "/aXb"),
      (3L, "h", "/c(d)x")).toDF("id", "host", "path")
    val out = Urls.robotsAllowed(urls, "id", "host", "path", rules)
      .orderBy("id").collect().toSeq.map(r => (r.getLong(0), r.getBoolean(3)))
    // '.' and parens must not act as regex: /aXb stays allowed
    assert(out === Seq(1L -> false, 2L -> true, 3L -> false))
  }

  test("dedupByUrl collapses canonical twins and keeps the min id") {
    val df = Seq(
      (5L, "http://A.co:80/x?b=1&a=2"),
      (3L, "HTTP://a.CO/x?a=2&b=1&utm_source=z#frag"),
      (9L, "http://a.co/x?a=2&b=1"),
      (7L, "http://b.co/y"),
      (8L, "mailto:junk")).toDF("id", "url")
    val out = Urls.dedupByUrl(df, "id", "url")
      .orderBy("url_canon").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out === Seq(
      ("http://a.co/x?a=2&b=1", 3L, 3L),
      ("http://b.co/y", 7L, 1L)))
  }
}
