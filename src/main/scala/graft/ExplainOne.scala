package graft
import java.nio.file.{Files, Paths}
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val q = args(0); val out = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(cores = 8, shufflePartitions = 8)
    val fn = SparkEntry.queries.get(q).orElse(SparkEntry.prodVariants.get(q)).get
    Files.writeString(Paths.get(out), fn(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
