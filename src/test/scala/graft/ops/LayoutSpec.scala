package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Scalar reference interleave. */
  private def refZ(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(k =>
      (((a >> k) & 1L) << (2 * k)) | (((b >> k) & 1L) << (2 * k + 1))).sum

  test("zValue matches the scalar interleave over the 5-bit grid") {
    val grid = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val got = grid.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (a, b) =>
      assert(got((a, b)) === refZ(a, b, 5), s"($a,$b)")
    }
    // the grid's z-values are a permutation of 0..1023 (bijection)
    assert(got.values.toSeq.sorted === (0L until 1024L))
  }

  test("aligned power-of-two boxes are CONTIGUOUS z-ranges") {
    // the property that makes z-order prune: a 2^m-aligned 2^m x 2^m box
    // occupies exactly one z-interval of length 4^m
    for ((a0, b0, m) <- Seq((64L, 128L, 5), (0L, 0L, 4), (96L, 32L, 5))) {
      val side = 1L << m
      val cells = for (a <- a0 until a0 + side; b <- b0 until b0 + side)
        yield refZ(a, b, 10)
      assert(cells.max - cells.min === side * side - 1,
        s"box ($a0,$b0,$m) not contiguous")
      assert(cells.toSet.size === (side * side).toInt)
    }
  }

  test("writeZOrdered: files carry tight ranges on BOTH key columns") {
    val n = 1 << 12
    val df = spark.range(n).select(
      (col("id") % 64).as("a"), ((col("id") * 17) % 64).as("b"))
    val path = java.nio.file.Files
      .createTempDirectory("zorder").toString + "/t"
    Layout.writeZOrdered(df, "a", "b", 6, path)
    val withFile = spark.read.parquet(path)
      .withColumn("f", input_file_name())
    val nFiles = withFile.select("f").distinct().count()
    if (nFiles > 1) {
      // per-file key spans: z-clustering keeps BOTH dimensions' spans
      // well under the full domain on average (a plain sort by `a`
      // would leave span(b) = full domain in every file)
      val spans = withFile.groupBy("f")
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .agg(avg("sa"), avg("sb")).head()
      assert(spans.getDouble(0) < 48.0, s"span(a) ${spans.getDouble(0)}")
      assert(spans.getDouble(1) < 48.0, s"span(b) ${spans.getDouble(1)}")
    }
    // the write is lossless
    assert(spark.read.parquet(path).count() === n)
  }
}
