package graft.parse

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import AliccpCodec._

/** The custom codegen'd expression must be indistinguishable from the
  * native-functions composition on any input — including malformed blobs. */
class ParseKvExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def both(blob: String): (Map[String, String], Map[String, String]) = {
    val df = Seq(Option(blob)).toDF("b")
    val slow = df.select(parseKv(col("b")).as("m")).as[Map[String, String]].head()
    val fast = df.select(parseKvFast(col("b")).as("m")).as[Map[String, String]].head()
    (slow, fast)
  }

  test("well-formed, duplicate-key, and null blobs match the composition") {
    for (blob <- Seq(
        s"101${KvSep}7${WeightSep}1.0${RecSep}205${KvSep}9${WeightSep}0.5",
        s"101${KvSep}1${WeightSep}1.0${RecSep}101${KvSep}2${WeightSep}1.0",
        "", null,
        s"$RecSep$RecSep",                       // only empty segments
        "justakey",                              // no separators at all
        s"a${KvSep}b${KvSep}c${WeightSep}w",     // nested kv seps
        s"${WeightSep}leading",                  // weight sep first
        s"k$KvSep",                              // empty value
        s"${KvSep}v")) {                         // empty key
      val (slow, fast) = both(blob)
      assert(fast === slow, s"mismatch on ${Option(blob).map(_.replace('','|').replace('','=').replace('','#'))}")
    }
  }

  test("property: equivalence on random structured blobs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val tok = Gen.oneOf(Gen.alphaNumChar.map(_.toString),
      Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString))
    val triple = for { k <- tok; v <- tok; w <- tok }
      yield s"$k$KvSep$v$WeightSep$w"
    val degenerate = Gen.oneOf("", "x", s"x$KvSep", s"$WeightSep", s"a${KvSep}b")
    val blob = Gen.listOf(Gen.frequency(8 -> triple, 2 -> degenerate))
      .map(_.mkString(RecSep))
    val prop = Prop.forAll(blob) { b =>
      val (slow, fast) = both(b)
      fast == slow
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: parse_kv_fields slot equals map extraction on random blobs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val ids = Seq("101", "205", "k", "absent")
    val tok = Gen.oneOf(Gen.oneOf(ids), // bias toward requested ids
      Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString))
    val triple = for { k <- tok; v <- tok; w <- tok }
      yield s"$k$KvSep$v$WeightSep$w"
    val degenerate = Gen.oneOf("", "x", s"x$KvSep", s"$WeightSep", s"a${KvSep}b")
    val blob = Gen.listOf(Gen.frequency(8 -> triple, 2 -> degenerate))
      .map(_.mkString(RecSep))
    val prop = Prop.forAll(blob) { b =>
      val df = Seq(b).toDF("b")
      val struct = call_function("parse_kv_fields", col("b"), typedlit(ids))
      val viaStruct = df.select(
        array(ids.map(struct.getField): _*)).as[Seq[Option[String]]].head()
      val viaMap = df.select(
        array(ids.map(id => element_at(parseKvFast(col("b")), id)): _*))
        .as[Seq[Option[String]]].head()
      viaStruct == viaMap
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("parse_kv is callable from SQL (extension registration)") {
    val out = spark.sql(
      s"SELECT parse_kv('101${KvSep}7${WeightSep}1.0') AS m")
      .as[Map[String, String]].head()
    assert(out === Map("101" -> "7"))
  }
}
