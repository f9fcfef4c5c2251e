package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Scaling-vs-Bench graph-gate evidence split (r17 VERDICT
  * "what's wrong" #3): with `spark.graft.linkgraph.localMax` defaulted
  * to 100k, BENCH measures the driver-local graph solves (fixture
  * graphs all fit the gate) — so the DISTRIBUTED fixed-point/walk
  * evidence lives exclusively in `graft.Scaling`'s graph rows, which
  * must pin the gates to 0. Until this spec, that was a convention in
  * Scaling.scala, not a contract; losing one of these pins would
  * silently turn the weak-scaling rows into driver-local measurements
  * and the distributed paths would rot unobserved. (Both-paths row
  * identity is pinned separately in LinkGraphSpec / the CC specs.) */
class ScalingGatePinSpec extends AnyFunSuite {

  private lazy val src = {
    val p = java.nio.file.Paths.get("src/main/scala/graft/Scaling.scala")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("Scaling pins linkgraph.localMax=0 for the distributed graph rows") {
    val pins = "withConf\\(\"spark\\.graft\\.linkgraph\\.localMax\", \"0\"\\)".r
      .findAllIn(src).length
    // one for the sssp row, one for the pagerank row
    assert(pins >= 2,
      "Scaling's sssp/pagerank rows must run with linkgraph.localMax=0 — " +
        "they are the only distributed-path evidence (BENCH runs gated)")
  }

  test("Scaling pins cc.localMax=0 for the distributed CC row") {
    assert(src.contains("withConf(\"spark.graft.cc.localMax\", \"0\")"),
      "Scaling's cc row must run with cc.localMax=0 — it is the only " +
        "distributed union-find evidence (BENCH runs gated)")
  }

  test("the pins RESTORE the prior gate value (no unset clobber)") {
    // withConf is the restoring toggle; a bare conf.set of a gate key
    // outside it would clobber operator-set gates for the rest of the
    // run (r17 ADVICE #4)
    val bareSets = "spark\\.conf\\.set\\(\"spark\\.graft\\.(linkgraph|cc)\\.localMax\"".r
      .findAllIn(src.replaceAll("(?s)def withConf.*?\\n    \\}", ""))
      .length
    assert(bareSets === 0,
      "gate confs in Scaling must go through withConf (restores prior value)")
  }
}
