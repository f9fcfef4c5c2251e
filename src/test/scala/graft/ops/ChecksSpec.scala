package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def byName(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap

  test("all four check kinds count violations exactly") {
    val df = Seq(
      (Some(1L), Some(0.05), "a"),
      (Some(1L), Some(0.05), "a"),   // dup key (1, also dup full row)
      (Some(2L), Some(0.15), "b"),   // out of range
      (Some(3L), None, "c"),         // null rate target
      (Some(9L), Some(0.0), "d"),    // orphan vs ref
      (None, Some(0.1), "e"))        // null key: excluded from ref check
      .toDF("k", "disc", "tag")
    val ref = Seq(1L, 2L, 3L).toDF("rk")
    val out = byName(Checks.run(df, Seq(
      Checks.NotNull("disc", maxNullRate = 0.2),
      Checks.NotNull("k"),
      Checks.InRange("disc", 0.0, 0.1),
      Checks.Unique(Seq("k")),
      Checks.RefIntegrity("k", ref, "rk"))))
    assert(out("not_null:disc") === ((1L, 6L, 0.166667, true)))
    assert(out("not_null:k") === ((1L, 6L, 0.166667, false)))
    assert(out("in_range:disc") === ((1L, 6L, 0.166667, false)))
    assert(out("unique:k") === ((1L, 6L, 0.166667, false)))
    // 5 non-null keys, one (9) orphaned
    assert(out("ref:k") === ((1L, 5L, 0.2, false)))
  }

  test("clean table passes; empty table is vacuously clean (no NaN)") {
    val df = Seq((1L, 0.05), (2L, 0.07)).toDF("k", "disc")
    val ref = Seq(1L, 2L).toDF("rk")
    val clean = Checks.run(df, Seq(
      Checks.NotNull("k"), Checks.InRange("disc", 0.0, 0.1),
      Checks.Unique(Seq("k")), Checks.RefIntegrity("k", ref, "rk")))
    assert(clean.collect().forall(_.getBoolean(4)))
    val empty = Checks.run(df.filter(lit(false)), Seq(
      Checks.NotNull("k"), Checks.Unique(Seq("k")),
      Checks.RefIntegrity("k", ref, "rk")))
    empty.collect().foreach { r =>
      assert(r.getLong(1) === 0L && r.getDouble(3) === 0.0 && r.getBoolean(4))
    }
  }

  test("pass gates on the UNROUNDED rate; only the report rounds") {
    // 1 null in 3 rows: true rate 1/3 = 0.3333333..., reported rate
    // rounds DOWN to 0.333333. A gate on the rounded rate would pass a
    // 0.333333 threshold; the unrounded gate must fail it — the small-N
    // twin of the 100 TB trap (1 bad row in >2M rows rounds to 0.0 and
    // would sail through a zero-tolerance check).
    val df = Seq(Some(1.0), Some(2.0), None).toDF("x")
    val under = byName(Checks.run(df,
      Seq(Checks.NotNull("x", maxNullRate = 0.333333))))
    assert(under("not_null:x") === ((1L, 3L, 0.333333, false)))
    // at exactly the true rate the gate passes (<= is inclusive)
    val at = byName(Checks.run(df,
      Seq(Checks.NotNull("x", maxNullRate = 1.0 / 3))))
    assert(at("not_null:x")._4 === true)
    // zero-tolerance InRange: any nonzero violation count fails, however
    // small the rate would round
    val wide = Seq.tabulate(4000)(i => i.toDouble) :+ 99999.0
    val ir = byName(Checks.run(wide.toDF("x"),
      Seq(Checks.InRange("x", 0.0, 5000.0))))
    assert(ir("in_range:x")._1 === 1L && ir("in_range:x")._4 === false)
  }

  test("duplicate reference keys do not multiply the ref-check total") {
    val df = Seq(1L, 2L, 3L).toDF("k")
    val ref = Seq(1L, 1L, 1L, 2L).toDF("rk") // dup keys in the dimension
    val out = byName(Checks.run(df,
      Seq(Checks.RefIntegrity("k", ref, "rk"))))
    assert(out("ref:k") === ((1L, 3L, 0.333333, false)))
  }
}
