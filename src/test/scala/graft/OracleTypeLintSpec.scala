package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Committed gate for the round-12 q200/q202/q212 class bug: a bare
  * `SUM(...)` in an oracle's SELECT list is typed HUGEINT by DuckDB
  * while the engine emits int64, and the driver's hasher is
  * type-sensitive — every value identical, row still red. The gate
  * DESCRIBEs every static oracle via `tools/oracle_lint.py` against the
  * smallest fixture's schemas (DESCRIBE binds, it does not execute) and
  * fails on any HUGEINT/DECIMAL output column. Sound because the engine
  * never emits those types (no int128 in Spark; no query surfaces
  * DecimalType). Cancels, not passes, when python3+duckdb or the
  * fixture is absent so CI environments without the driver toolchain
  * skip loudly. */
class OracleTypeLintSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(cmd: Seq[String]): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  private def toolchainReady: Boolean =
    Files.exists(Paths.get(sfDir)) &&
      (try run(Seq("python3", "-c", "import duckdb"))._1 == 0
       catch { case _: java.io.IOException => false })

  private def lint(oracles: Map[String, String]): (Int, String) = {
    val tmp = Files.createTempFile("oracle_lint", ".json")
    try {
      Files.writeString(tmp, OracleManifest.renderSqlJson(oracles))
      run(Seq("python3", "tools/oracle_lint.py", tmp.toString, sfDir))
    } finally Files.deleteIfExists(tmp)
  }

  test("no static oracle leaves a HUGEINT/DECIMAL output column") {
    assume(toolchainReady, "python3+duckdb or sf0.001 fixture unavailable")
    val (code, out) = lint(SparkEntry.staticOracleSql)
    assert(code == 0, s"oracle type lint flagged:\n$out")
  }

  test("lint is red on a planted bare-SUM oracle") {
    assume(toolchainReady, "python3+duckdb or sf0.001 fixture unavailable")
    val (code, out) = lint(Map(
      "planted_bare_sum" -> "SELECT SUM(o_orderkey) AS n FROM orders"))
    assert(code != 0 && out.contains("planted_bare_sum"),
      s"planted HUGEINT oracle not flagged:\n$out")
  }
}
