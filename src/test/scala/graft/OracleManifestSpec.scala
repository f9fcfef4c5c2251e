package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the committed ORACLE_MANIFEST.json against silent oracle
  * drift: recomputes every static oracle's SHA-256 and fails NAMING the
  * queries whose strings changed / appeared / vanished since the
  * manifest was recorded. Pure-JVM (no Spark) — the maps are plain
  * string literals in a fresh JVM (the dynamic q39/q76/q80 oracles only
  * materialize after their queries run, so they are exactly the
  * `no_static_oracle` list here). */
class OracleManifestSpec extends AnyFunSuite {

  private def recordedShas(json: String): Map[String, String] =
    """"(q[0-9a-z_]+)":\s*"([0-9a-f]{64})"""".r
      .findAllMatchIn(json).map(m => m.group(1) -> m.group(2)).toMap

  test("committed manifest matches the live oracle strings, per query") {
    val path = java.nio.file.Paths.get(OracleManifest.ManifestPath)
    assert(java.nio.file.Files.exists(path),
      s"ORACLE_MANIFEST.json missing — run `sbt \"runMain graft.OracleManifest\"`")
    val recorded = recordedShas(
      new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
    val live = SparkEntry.staticOracleSql.map { case (q, sql) =>
      q -> OracleManifest.sha256Hex(sql)
    }
    val added = (live.keySet -- recorded.keySet).toSeq.sorted
    val removed = (recorded.keySet -- live.keySet).toSeq.sorted
    val changed = live.keySet.intersect(recorded.keySet)
      .filter(q => live(q) != recorded(q)).toSeq.sorted
    assert(added.isEmpty && removed.isEmpty && changed.isEmpty,
      s"""oracle strings drifted from ORACLE_MANIFEST.json:
         |  changed: ${changed.mkString(", ")}
         |  added:   ${added.mkString(", ")}
         |  removed: ${removed.mkString(", ")}
         |If intended: re-run the FULL verify sweep (all queries — an
         |over-broad edit can clobber an UNTOUCHED query's oracle), then
         |`sbt "runMain graft.OracleManifest"` and commit the manifest.""".stripMargin)
  }

  test("manifest render is deterministic and covers every query") {
    val r1 = OracleManifest.render()
    assert(r1 == OracleManifest.render())
    val all = SparkEntry.queries.keySet
    val inManifest = recordedShas(r1).keySet ++
      """"(q[0-9a-z_]+)"""".r.findAllMatchIn(
        r1.linesIterator.filter(_.contains("no_static_oracle")).mkString)
        .map(_.group(1)).toSet
    val missing = (all -- inManifest).toSeq.sorted
    assert(missing.isEmpty,
      s"queries absent from manifest render: ${missing.mkString(", ")}")
  }
}
