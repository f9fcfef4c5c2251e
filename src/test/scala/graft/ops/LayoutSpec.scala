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

  /** Row groups a parquet reader must fetch for a box predicate, from
    * the files' own footer min/max stats — exactly the statistics
    * Spark's pushed filters prune row groups with. */
  private def rowGroupsOverlapping(dir: String, aLo: Long, aHi: Long,
                                   bLo: Long, bHi: Long): (Int, Int) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    var total = 0
    var overlapping = 0
    files.foreach { f =>
      val rdr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f), conf))
      try {
        rdr.getFooter.getBlocks.asScala.foreach { blk =>
          total += 1
          def range(colName: String): (Long, Long) = {
            val c = blk.getColumns.asScala
              .find(_.getPath.toDotString == colName).get
            val st = c.getStatistics
            (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
              st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          }
          val (amin, amax) = range("a")
          val (bmin, bmax) = range("b")
          if (amax >= aLo && amin <= aHi && bmax >= bLo && bmin <= bHi)
            overlapping += 1
        }
      } finally rdr.close()
    }
    (overlapping, total)
  }

  test("z-order prunes ROW GROUPS under a box predicate; plain layout reads all") {
    // the read-side payoff q128/q129 imply: on the same 2^16-cell keyed
    // data, an aligned 128x128 box predicate must leave most z-ordered
    // row groups untouched (tight min/max on BOTH columns), while the
    // unordered layout's row groups all straddle the full domain. Small
    // parquet.block.size gives several row groups per file, so this is
    // row-group-stat pruning, not just file pruning.
    val n = 1 << 17
    val df = spark.range(n).select(
      ((col("id") * 2654435761L) % 1024).as("a"),
      ((col("id") * 40503L + 7) % 1024).as("b"))
    val base = java.nio.file.Files.createTempDirectory("zprune").toString
    val opts = Map("parquet.block.size" -> (64 * 1024).toString)
    Layout.writeZOrdered(df, "a", "b", 10, s"$base/z", opts)
    df.repartition(8).write.options(opts).mode("overwrite")
      .parquet(s"$base/plain")
    val (zHit, zTotal) = rowGroupsOverlapping(s"$base/z", 0, 127, 0, 127)
    val (pHit, pTotal) = rowGroupsOverlapping(s"$base/plain", 0, 127, 0, 127)
    assert(zTotal >= 8 && pTotal >= 8, s"grain too coarse: $zTotal/$pTotal")
    // unordered: every FULL row group spans ~the whole domain — only the
    // few-row trailing group per file can miss the box, so >=75% overlap
    assert(pHit * 4 >= pTotal * 3,
      s"plain layout unexpectedly pruned ($pHit/$pTotal)")
    // z-ordered: the 1/64th-of-domain box touches a small fraction
    assert(zHit * 4 <= zTotal,
      s"z-order pruned too little: $zHit of $zTotal row groups overlap")
    // and the box query returns identical rows from both layouts
    def boxCount(p: String) = spark.read.parquet(p)
      .filter(col("a") < 128 && col("b") < 128).count()
    assert(boxCount(s"$base/z") === boxCount(s"$base/plain"))
  }
}
