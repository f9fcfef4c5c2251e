package graft.model

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.BronzeSilver
import graft.parse.AliccpCodec._

/** End-to-end fidelity of the full 25-column silver projection: a blob
  * carrying every AliCCP field id must land in the right typed column. */
class AliccpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("schema contract: 25 silver columns, 17 gold keeps, 16 index cols") {
    assert(Aliccp.silverFields.size === 23)
    assert(Aliccp.silverSchema.fields.length === 25)
    assert(Aliccp.goldKeep.size === 17)
    assert(Aliccp.goldIndexCols.size === 16)
    assert(Aliccp.goldKeep.forall(c =>
      Aliccp.silverSchema.fieldNames.contains(c)))
  }

  test("typed Dataset[Interaction] round-trips the full silver schema") {
    implicit val s = spark
    val userIds = Set("101", "109_14", "110_14", "127_14", "150_14", "121",
      "122", "124", "125", "126", "127", "128", "129")
    val mk = (ids: Seq[(String, String)]) => ids.zipWithIndex
      .map { case ((id, _), i) => s"$id$KvSep${100 + i}${WeightSep}1.0" }
      .mkString(RecSep)
    val skeleton = Seq((7L, 1, 0, "cf_1",
      mk(Aliccp.silverFields.filterNot(f => userIds(f._1)))))
      .toDF("sample_id", "click", "conversion", "key", "blob")
    val common = Seq(("cf_1", mk(Aliccp.silverFields.filter(f => userIds(f._1)))))
      .toDF("key", "blob")
    val ds = Interaction.typed(
      BronzeSilver.toSilver(skeleton, common, Aliccp.silverFields))
    val row = ds.head()
    assert(row.sample_id === 7L)
    assert(row.user_id === Some(100) && row.click === Some(1))
    assert(row.position.isDefined && row.conversion === Some(0))
    // typed filter/map compiles and runs on the Dataset
    assert(ds.filter(_.click.contains(1)).count() === 1L)
  }

  test("toSilver maps every field id to its column across skeleton+common") {
    // skeleton carries item/interaction fields, common carries user fields —
    // the split the reference's two bronze files use
    val userIds = Set("101", "109_14", "110_14", "127_14", "150_14", "121",
      "122", "124", "125", "126", "127", "128", "129")
    val mk = (ids: Seq[(String, String)]) => ids.zipWithIndex
      .map { case ((id, _), i) => s"$id$KvSep${100 + i}${WeightSep}1.0" }
      .mkString(RecSep)
    val commonBlob = mk(Aliccp.silverFields.filter(f => userIds(f._1)))
    val skelBlob = mk(Aliccp.silverFields.filterNot(f => userIds(f._1)))
    val skeleton = Seq((1L, 1, 0, "cf_1", skelBlob))
      .toDF("sample_id", "click", "conversion", "key", "blob")
    val common = Seq(("cf_1", commonBlob)).toDF("key", "blob")
    val out = BronzeSilver.toSilver(skeleton, common, Aliccp.silverFields)
    assert(out.columns.toSeq ===
      "sample_id" +: Aliccp.silverSchema.fieldNames.toSeq)
    val row = out.head()
    // every mapped field non-null int; click/conversion injected
    Aliccp.silverSchema.fieldNames.foreach { c =>
      assert(!row.isNullAt(out.columns.indexOf(c)), s"column $c null")
    }
    assert(row.getAs[Int]("click") === 1)
    assert(row.getAs[Int]("conversion") === 0)
    // spot-check: user_id comes from common 101, item_id from skeleton 205
    assert(row.getAs[Int]("user_id") === 100)
    assert(row.getAs[Int]("position") === 109)
  }

  test("struct-extract toSilver is row-identical to the map-merge path") {
    // synthetic spine at sf0.001: every field id, overlaps, missing keys
    implicit val s = spark
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val skel = BronzeSilver.skeletonFromEvents(e)
    val common = BronzeSilver.commonFromEvents(e)
    val fast = BronzeSilver.toSilver(skel, common, BronzeSilver.syntheticFields)
    val ref = BronzeSilver.toSilverViaMap(skel, common, BronzeSilver.syntheticFields)
    // names + types; nullability differs (when/otherwise synthesizes a
    // non-nullable click) and is not part of the value contract
    assert(fast.schema.map(f => (f.name, f.dataType)) ===
      ref.schema.map(f => (f.name, f.dataType)))
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
  }

  test("overlapping field id: common blob wins over skeleton blob") {
    // process_csv_line_2 builds the skeleton dict then feat_dict.update
    // (value_dict) — the COMMON value must overwrite the skeleton one
    // (batch_process_Bronze_to_Silver.py:76-84).
    val skelBlob = s"101${KvSep}111${WeightSep}1.0${RecSep}205${KvSep}7${WeightSep}1.0"
    val commonBlob = s"101${KvSep}222${WeightSep}1.0"
    val skeleton = Seq((1L, 1, 0, "cf_1", skelBlob))
      .toDF("sample_id", "click", "conversion", "key", "blob")
    val common = Seq(("cf_1", commonBlob)).toDF("key", "blob")
    val out = BronzeSilver.toSilver(skeleton, common,
      Seq("101" -> "user_id", "205" -> "item_id"))
    val row = out.head()
    assert(row.getAs[Int]("user_id") === 222, "common must win on overlap")
    assert(row.getAs[Int]("item_id") === 7)
  }
}
