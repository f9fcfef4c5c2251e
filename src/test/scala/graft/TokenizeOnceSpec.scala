package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.scalatest.funsuite.AnyFunSuite

/** q135/q141's exact-verification sides consume the tokenized corpus
  * through exchanges that hash DIFFERENT keys (grp/source vs tok), so
  * AQE exchange reuse cannot cover them — the queries pin tokenize-once
  * with an explicit persist. These tests fail if the pin is dropped:
  * the documents parquet scan must appear in the CACHED relation, not
  * in the main executed plan (which would mean the corpus re-tokenizes
  * per consumer — a silent N× scan at 100 TB). */
class TokenizeOnceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** documents-parquet FileScans in the EXECUTED main plan (cache
    * children live inside the InMemoryRelation, not this tree). AQE
    * wraps materialized stages in leaf QueryStageExec nodes, so the
    * walk descends into `stage.plan` explicitly; it stops at
    * InMemoryTableScanExec (the cache boundary — the cached relation's
    * own one-time build scan is exactly what we DON'T count). */
  private def audit(name: String): (Int, Int) = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: InMemoryTableScanExec => Nil
      case other => other.children.flatMap(walk)
    })
    val nodes = walk(df.queryExecution.executedPlan)
    val docScans = nodes.count {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains("documents"))
      case _ => false
    }
    val cacheScans = nodes.count(_.isInstanceOf[InMemoryTableScanExec])
    (docScans, cacheScans)
  }

  test("q135 tokenizes the corpus once (persist pin holds)") {
    val (docScans, cacheScans) = audit("q135_kmv_overlap")
    assert(docScans === 0,
      s"$docScans uncached documents scans — the tokenize-once pin is gone")
    assert(cacheScans >= 2, "expected sketch + exact sides to read the cache")
  }

  test("q141 tokenizes the corpus once (persist pin holds)") {
    val (docScans, cacheScans) = audit("q141_kmv_matrix")
    assert(docScans === 0,
      s"$docScans uncached documents scans — the tokenize-once pin is gone")
    assert(cacheScans >= 3,
      "expected sketch + sizes + both intersection sides to read the cache")
  }
}
