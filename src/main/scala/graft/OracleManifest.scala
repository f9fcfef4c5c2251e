package graft

/** Oracle checksum manifest — regenerates `ORACLE_MANIFEST.json`, one
  * line per query: the SHA-256 of the hand-written DuckDB oracle string
  * ([[SparkEntry.staticOracleSql]]) plus a trailing list of query names
  * that ship without a static oracle (dynamic or rows-only).
  *
  * Why: the oracle strings live in one large map and share SQL
  * boilerplate across queries, so a careless edit (the round-8 q46
  * incident: an over-broad string replace) can silently rewrite an
  * UNRELATED query's oracle — surviving compile, spec, and any targeted
  * verify of the touched query. With the manifest committed, `git diff`
  * names exactly which oracle strings a change touched, and
  * `OracleManifestSpec` fails the build listing them until the manifest
  * is re-recorded — forcing the full-sweep discipline.
  *
  * Usage: `sbt "runMain graft.OracleManifest"` after any INTENDED oracle
  * change, then re-run the FULL verify sweep (every query, not just the
  * touched one) before committing the updated manifest.
  */
object OracleManifest {

  def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  /** Manifest content: deterministic (sorted keys, fixed layout) so the
    * file diffs cleanly line-by-line per query. */
  def render(): String = {
    val oracles = SparkEntry.staticOracleSql
    val noStatic =
      (SparkEntry.queries.keySet -- oracles.keySet).toSeq.sorted
    val entries = oracles.toSeq.sortBy(_._1).map { case (q, sql) =>
      s"""  "$q": "${sha256Hex(sql)}""""
    }.mkString(",\n")
    val dyn = noStatic.map(q => s""""$q"""").mkString(", ")
    s"""{
       | "oracle_sha256": {
       |$entries
       | },
       | "no_static_oracle": [$dyn]
       |}
       |""".stripMargin
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    * Shared by Verify's oracle_sql.json dump and the type-lint spec. */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Render a name→SQL map as the oracle_sql.json object. */
  def renderSqlJson(m: Map[String, String]): String =
    m.map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
      .mkString("{", ",", "}")

  val ManifestPath = "ORACLE_MANIFEST.json"

  def main(args: Array[String]): Unit = {
    val path = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else ManifestPath)
    java.nio.file.Files.write(path,
      render().getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[manifest] wrote ${path.toAbsolutePath} " +
      s"(${SparkEntry.staticOracleSql.size} oracles)")
  }
}
