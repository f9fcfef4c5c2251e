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

  test("writeCsvSample: one file, header, n rows") {
    val dir = java.nio.file.Files.createTempDirectory("csvs").toString
    Sources.writeCsvSample(spark.range(50).toDF("id"), s"$dir/out", n = 7)
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(files.length === 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head === "id" && lines.size === 8)
  }
}
