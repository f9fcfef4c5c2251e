package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("csv scan with explicit schema — no inference, typed columns") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"), "1,0,cf_1\n2,1,cf_2\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("click", IntegerType),
      StructField("key", StringType)))
    val df = Sources.csv(spark, s"$dir/in.csv", schema)
    assert(df.schema === schema)
    assert(df.as[(Long, Int, String)].collect().toSet
      === Set((1L, 0, "cf_1"), (2L, 1, "cf_2")))
  }

  test("writeParquet bounds rows per file in a single pass") {
    val dir = java.nio.file.Files.createTempDirectory("pq").toString
    Sources.writeParquet(
      spark.range(100).toDF("id").coalesce(1), s"$dir/out", rowsPerFile = 30)
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length === 4) // 30+30+30+10
    assert(spark.read.parquet(s"$dir/out").count() === 100L)
  }

  test("orc round-trips typed columns and pushes filters to the scan") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    val in = Seq((1L, Some(5.5), "a"), (2L, None, "b"), (3L, Some(-1.0), null))
      .toDF("id", "v", "tag")
    Sources.writeOrc(in, s"$dir/out", rowsPerFile = 2)
    val back = Sources.orc(spark, s"$dir/out")
    assert(back.as[(Long, Option[Double], Option[String])].collect().toSet
      === Set((1L, Some(5.5), Some("a")), (2L, None, Some("b")),
        (3L, Some(-1.0), None)), "nulls and types must survive the hop")
    // predicate pushdown reaches the ORC scan like parquet's
    val filtered = back.filter(col("id") > 1L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)"),
      s"no pushed filter in ORC scan:\n$plan")
    assert(filtered.count() === 2L)
  }

  test("bucketed tables join without any shuffle Exchange") {
    import org.apache.spark.sql.functions.col
    Seq("bkt_left", "bkt_right").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    try {
      // sort-merge path so co-location matters (broadcast would hide it)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Sources.writeBucketed(
        spark.range(1000).withColumn("v", col("id") * 2).toDF("k", "v"),
        "bkt_left", "k", buckets = 4)
      Sources.writeBucketed(
        spark.range(500).withColumn("w", col("id") + 1).toDF("k", "w"),
        "bkt_right", "k", buckets = 4)
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be co-located, plan:\n$plan")
      assert(joined.count() === 500L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (64L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("writeCsvSample: one file, header, n rows") {
    val dir = java.nio.file.Files.createTempDirectory("csvs").toString
    Sources.writeCsvSample(spark.range(50).toDF("id"), s"$dir/out", n = 7)
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(files.length === 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head === "id" && lines.size === 8)
  }

  test("Tables.stream reads BOTH fixture layouts: single file and part-file dir") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tstream").toString
    // single-FILE layout (the fixture shape): one parquet file named
    // <table>.parquet directly under the sf dir
    val single = s"$root/single"
    new java.io.File(single).mkdirs()
    val tmp = s"$root/tmp"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(single, "events.parquet"))
    // DIRECTORY layout (the scaling-replica shape): <table>.parquet is a
    // directory of part files — where a dir-level glob matches nothing
    val repl = s"$root/replica"
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
      .repartition(2).write.parquet(s"$repl/events.parquet")
    def rows(dir: String): Long =
      graft.streaming.Streams.runToMemory(
        graft.sources.Tables.stream(spark, dir, "events")
          .groupBy().agg(count(lit(1)).as("n")),
        s"tstream_${System.nanoTime()}").as[Long].head()
    assert(rows(single) === 3L, "single-file fixture layout must stream")
    assert(rows(repl) === 4L,
      "part-file directory layout must stream (the silent-0-rows bug)")
  }
}
