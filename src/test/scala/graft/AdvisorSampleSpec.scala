package graft

import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** The layout advisors (q213/q216) simulate file assignment with a
  * global-order NTILE — legitimate ONLY because their input is the
  * bounded deterministic hash top-k sample. This pins the bound in the
  * executed plan: every unpartitioned window in those queries must sit
  * above a limit node carrying the advisor budget, so no fixture or
  * future edit can silently re-widen the single-task sort to the table. */
class AdvisorSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def executed(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan
  }

  private def assertBudgetBounded(name: String): Unit = {
    val plan = executed(name).toString
    val hasGlobalWindow = plan.contains("Window") // ntile is a Window fn
    val limits = "TakeOrderedAndProject\\(limit=(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1).toInt).toSeq
    assert(hasGlobalWindow, s"$name: expected the simulated-NTILE window")
    assert(limits.nonEmpty,
      s"$name: no TakeOrderedAndProject budget gate in executed plan:\n$plan")
    assert(limits.forall(_ <= 100000),
      s"$name: budget gate exceeds the advisor budget: $limits")
  }

  test("q213 layout advisor sorts only the budget-bounded sample") {
    assertBudgetBounded("q213_layout_depth")
  }

  test("q216 z-order advisor sorts only the budget-bounded sample") {
    assertBudgetBounded("q216_zorder_depth")
  }

  test("q216 fails loudly when a dimension leaves the 14-bit Morton domain") {
    // plant an orders table whose customer keys exceed 2^14
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("advq216").toString
    val bad = Seq((1L, "1995-01-01", 20000L), (2L, "1995-01-02", 20001L))
      .toDF("o_orderkey", "o_orderdate", "o_custkey")
    bad.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val e = intercept[IllegalArgumentException] {
      SparkEntry.queries("q216_zorder_depth")(spark, tmp).collect()
    }
    assert(e.getMessage.contains("Morton"), e.getMessage)
  }
}
