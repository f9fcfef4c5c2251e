package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-query shuffle-byte probe: runs a named query through the noop
  * sink with a stage listener and prints total shuffle bytes written /
  * read and records — the §2.3 "shuffle fewer bytes" evidence the UI
  * would show, collected headless. Usage:
  *   runMain graft.ShuffleProbe <query> [sfDir]
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(cores = 32, shufflePartitions = 32)
    @volatile var wBytes = 0L
    @volatile var wRecs = 0L
    @volatile var rBytes = 0L
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          wBytes += m.shuffleWriteMetrics.bytesWritten
          wRecs += m.shuffleWriteMetrics.recordsWritten
          rBytes += m.shuffleReadMetrics.totalBytesRead
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fn = SparkEntry.queries.get(q)
      .orElse(SparkEntry.prodVariants.get(q)).get
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.sparkContext.removeSparkListener(listener)
    println(f"[shuffle-probe] $q writeBytes=$wBytes writeRecords=$wRecs readBytes=$rBytes")
    spark.stop()
  }
}
