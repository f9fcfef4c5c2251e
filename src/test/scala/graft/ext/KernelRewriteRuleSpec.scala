package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KernelRewriteRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // parquet-backed so ConvertToLocalRelation can't fold the whole projection
  // away before the rewrite is observable
  private lazy val df = {
    val dir = java.nio.file.Files.createTempDirectory("krr").toString
    Seq(
      (Seq(1f, 2f, 3f), Seq(0.5f, 0.5f, 0.5f)),
      (Seq(-1f, 0f, 1f), Seq(1f, 1f, 1f))).toDF("a", "b")
      .write.parquet(s"$dir/v")
    spark.read.parquet(s"$dir/v")
  }

  test("HOF dot-product composition is rewritten to the vec_dot kernel") {
    val hof = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot"),
      s"expected kernel rewrite, plan:\n$optimized")
    assert(hof.as[Double].collect().toSet === Set(3.0, 0.0))
  }

  test("rewrite preserves NULL-on-unequal-lengths semantics") {
    val dir = java.nio.file.Files.createTempDirectory("krr2").toString
    Seq((Seq(1f, 2f, 3f), Seq(2f, 2f, 2f)), (Seq(1f, 2f), Seq(1f)))
      .toDF("a", "b").write.parquet(s"$dir/v")
    val uneq = spark.read.parquet(s"$dir/v")
    val hof = uneq.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    // zip_with pads the short side with null -> the HOF yields NULL; the
    // guarded kernel must reproduce that, not truncate to min length
    assert(hof.as[Option[Double]].collect().toSet === Set(Some(12.0), None))
  }

  test("null elements: rewrite fires and reproduces the HOF's NULL result") {
    val dir = java.nio.file.Files.createTempDirectory("krr3").toString
    Seq((Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(2f), Some(3f))))
      .toDF("a", "b").write.parquet(s"$dir/v")
    val nullable = spark.read.parquet(s"$dir/v")
    val hof = nullable.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    // null element poisons the HOF fold -> NULL; the kernel must match
    assert(hof.as[Option[Double]].collect().toSet === Set(None))
  }

  test("integer HOF dot composition is rewritten to the vec_dot_i kernel") {
    val dir = java.nio.file.Files.createTempDirectory("krr4").toString
    Seq(
      (Seq(1.toByte, 2.toByte), Seq(3.toByte, 4.toByte)),
      (Seq(127.toByte, -127.toByte), Seq(1.toByte, 1.toByte)))
      .toDF("a", "b").write.parquet(s"$dir/v")
    val ints = spark.read.parquet(s"$dir/v")
    val hof = ints.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v).as("d"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot_i"),
      s"expected integer kernel rewrite, plan:\n$optimized")
    assert(hof.as[Long].collect().toSet === Set(11L, 0L))
    // a DOUBLE fold over integral arrays must not take the int kernel
    val dbl = ints.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!dbl.queryExecution.optimizedPlan.toString.contains("vec_dot_i"))
  }

  test("non-matching aggregates are left untouched") {
    // different zero, different merge — must NOT rewrite
    val other = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0), (acc, v) => acc + v * 2).as("d"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    // max-merge fold
    val maxFold = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => greatest(acc, v)).as("d"))
    assert(!maxFold.queryExecution.optimizedPlan.toString.contains("vec_dot"))
  }
}
