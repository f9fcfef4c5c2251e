package graft.parse

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import AliccpCodec._

/** Edge cases from the reference parser's semantics
  * (batch_process_Bronze_to_Silver.py:69-84): weight dropped, last-wins
  * duplicates, None on missing field, merge precedence. */
class AliccpCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parse1(blob: String): Map[String, String] =
    Seq(Option(blob)).toDF("b")
      .select(parseKv(col("b")).as("m")).as[Map[String, String]].head()

  test("basic triples parse; weight discarded") {
    assert(parse1(s"101${KvSep}7${WeightSep}1.0${RecSep}205${KvSep}9${WeightSep}0.5")
      === Map("101" -> "7", "205" -> "9"))
  }

  test("empty and null blobs -> empty map") {
    assert(parse1("") === Map.empty)
    assert(parse1(null) === Map.empty)
  }

  test("duplicate field ids are last-wins (dict.update semantics)") {
    assert(parse1(s"101${KvSep}1${WeightSep}1.0${RecSep}101${KvSep}2${WeightSep}1.0")
      === Map("101" -> "2"))
  }

  test("missing field extracts as null int") {
    val r = Seq(s"101${KvSep}7${WeightSep}1.0").toDF("b")
      .select(field(parseKv(col("b")), "205", "item_id"))
      .head()
    assert(r.isNullAt(0))
  }

  test("field extraction casts to int; non-numeric -> null under try_element_at+cast") {
    val r = Seq(s"101${KvSep}abc${WeightSep}1.0").toDF("b")
      .select(field(parseKv(col("b")), "101", "user_id")).head()
    assert(r.isNullAt(0))
  }

  test("merge precedence: later maps win (skeleton over common)") {
    val df = Seq((s"101${KvSep}common${WeightSep}1.0",
                  s"101${KvSep}skel${WeightSep}1.0")).toDF("c", "s")
    val m = df.select(mergeKv(parseKv(col("c")), parseKv(col("s"))).as("m"))
      .as[Map[String, String]].head()
    assert(m("101") === "skel")
  }

  test("format/parse round-trip identity") {
    val m = Map("101" -> "7", "109_14" -> "42", "click" -> "1")
    val df = Seq(m).toDF("m")
    val back = df.select(parseKv(formatKv(col("m"))).as("m"))
      .as[Map[String, String]].head()
    assert(back === m)
  }

  test("round-trip property over generated maps") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val tok = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val gen = Gen.mapOf(Gen.zip(tok, tok))
    val prop = Prop.forAll(gen) { m =>
      val back = Seq(m).toDF("m")
        .select(parseKv(formatKv(col("m"))).as("m"))
        .as[Map[String, String]].head()
      back == m
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
