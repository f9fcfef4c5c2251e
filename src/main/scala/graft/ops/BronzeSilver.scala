package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.parse.AliccpCodec._

/** The reference's Bronze->Silver spine as one native pipeline: KV-blob
  * parse -> left join skeleton⋈common on the common-feature key -> invalid
  * -sample filter -> typed wide projection.
  *
  * Reference: /root/reference/data_processing/batch_processing/
  * batch_process_Bronze_to_Silver.py — join :182-184, filter :186-187
  * (drop rows with click=0 AND conversion=1), merge-parse :188-192 with
  * common-wins-over-skeleton precedence (the skeleton dict is built first,
  * then `feat_dict.update(value_dict)` at :81 lets the common map
  * overwrite it), projection :206-300.
  *
  * Scale design (SURVEY.md §4.2/§4.3): the common side is per-user (orders
  * of magnitude smaller than impressions) — broadcast it, so the 100 TB
  * skeleton scan never shuffles. The reference instead collectAsMap'd the
  * whole common table to the driver. Parsing is native expressions inside
  * WholeStageCodegen, not Python UDFs, and the filter sits below the join
  * (Catalyst pushes it onto the skeleton scan).
  */
object BronzeSilver {

  /** skeleton(sample_id, click, conversion, key, blob) ⋈ common(key, blob)
    * -> wide silver table. `fields` maps AliCCP field id -> output column
    * name (SURVEY.md §1.4); click/conversion are injected last exactly like
    * the reference's process_csv_line_2.
    *
    * Extraction path: one `parse_kv_fields` struct per blob (single string
    * walk, no intermediate map, no per-column map probe) and per-field
    * `coalesce(common.f, skeleton.f)` for the common-wins merge — identical
    * results to the mergeKv map path ([[toSilverViaMap]], property-tested
    * in AliccpSpec), measured ~1.7x on the q14 spine. */
  def toSilver(skeleton: DataFrame, common: DataFrame,
               fields: Seq[(String, String)]): DataFrame = {
    val joined = joinAndFilter(skeleton, common)
    val ids = fields.map(_._1)
    val sf = call_function("parse_kv_fields",
      coalesce(col("blob"), lit("")), typedlit(ids))
    val cf = call_function("parse_kv_fields",
      coalesce(col("common_blob"), lit("")), typedlit(ids))
    joined.select(
      col("sample_id") +:
        fields.map { case (id, name) =>
          coalesce(cf.getField(id), sf.getField(id)).try_cast("int").as(name)
        } :+
        col("click").cast("int").as("click") :+
        col("conversion").cast("int").as("conversion"): _*)
  }

  /** The general-purpose map-merge formulation of [[toSilver]] (mergeKv
    * LAST_WIN + per-field map extraction) — kept as the independent
    * reference implementation the struct path is property-tested against,
    * and as the surface for ad-hoc field sets not known at plan time. */
  def toSilverViaMap(skeleton: DataFrame, common: DataFrame,
                     fields: Seq[(String, String)]): DataFrame = {
    val joined = joinAndFilter(skeleton, common)
    // Last-wins order mirrors process_csv_line_2: skeleton parsed first,
    // common update()s over it, click/conversion assigned last (:80-83).
    val merged = mergeKv(
      parseKvFast(col("blob")),
      parseKvFast(col("common_blob")),
      map(lit("click"), col("click").cast("string"),
          lit("conversion"), col("conversion").cast("string")))
    joined.select(
      col("sample_id") +:
        fields.map { case (id, name) => field(merged, id, name) } :+
        try_element_at(merged, lit("click")).cast("int").as("click") :+
        try_element_at(merged, lit("conversion")).cast("int").as("conversion"): _*)
  }

  private def joinAndFilter(skeleton: DataFrame, common: DataFrame): DataFrame =
    skeleton.join(
      broadcast(common.withColumnRenamed("blob", "common_blob")), Seq("key"), "left")
      // keep iff NOT (click = 0 AND conversion = 1) — invalid conversion
      // without click (batch_process_Bronze_to_Silver.py:186-187)
      .filter(col("click") =!= 0 || col("conversion") =!= 1)

  /** Deterministic bronze synthesis from the `events` fixture — the unit/
    * oracle harness for [[toSilver]] (the real AliCCP CSVs are not in this
    * container), covering the FULL 23-field silver projection (SURVEY
    * §1.4). Single source of truth: each field's value is `source % mod`
    * (mod 0 = identity) over a typed events column, so the DuckDB oracle
    * recomputes the expected table from the same spec (SparkEntry builds
    * its q14 SQL from this Seq).
    *
    * (id, column, modulus, source): user-side fields ride the common blob
    * (derived from user_id), item/interaction fields ride the skeleton
    * blob (derived from event_id) — the same split as the reference's two
    * bronze files. */
  val syntheticSpec: Seq[(String, String, Long, String)] = Seq(
    ("101", "user_id", 0L, "user"),
    ("109_14", "user_categories", 11L, "user"),
    ("110_14", "user_shops", 13L, "user"),
    ("127_14", "user_brands", 17L, "user"),
    ("150_14", "user_intentions", 19L, "user"),
    ("121", "user_profile", 23L, "user"),
    ("122", "user_group", 29L, "user"),
    ("124", "user_gender", 2L, "user"),
    ("125", "user_age", 7L, "user"),
    ("126", "user_consumption_1", 31L, "user"),
    ("127", "user_consumption_2", 37L, "user"),
    ("128", "user_is_occupied", 3L, "user"),
    ("129", "user_geography", 41L, "user"),
    ("205", "item_id", 1000L, "item"),
    ("206", "item_category", 50L, "item"),
    ("207", "item_shop", 97L, "item"),
    ("210", "item_intention", 89L, "item"),
    ("216", "item_brand", 83L, "item"),
    ("508", "user_item_categories", 79L, "item"),
    ("509", "user_item_shops", 73L, "item"),
    ("702", "user_item_brands", 71L, "item"),
    ("853", "user_item_intentions", 67L, "item"),
    ("301", "position", 61L, "item"))

  private def blobFor(src: Column, fields: Seq[(String, String, Long, String)]): Column = {
    val frags = fields.map { case (id, _, mod, _) =>
      val v = if (mod == 0L) src else src % mod
      concat(lit(id), lit(KvSep), v.cast("string"), lit(WeightSep), lit("1.0"))
    }
    concat_ws(RecSep, frags: _*)
  }

  def skeletonFromEvents(e: DataFrame): DataFrame =
    e.select(
      col("event_id").as("sample_id"),
      // when/otherwise, not bool-cast: a NULL event_id must yield 0 like
      // the oracle's CASE WHEN ... THEN 1 ELSE 0 (a NULL click would also
      // be silently dropped by the invalid-sample filter)
      when(col("event_id") % 3 === 0, 1).otherwise(0).as("click"),
      when(col("event_id") % 5 === 0, 1).otherwise(0).as("conversion"),
      concat(lit("cf_"), col("user_id")).as("key"),
      blobFor(col("event_id"), syntheticSpec.filter(_._4 == "item")).as("blob"))

  def commonFromEvents(e: DataFrame): DataFrame =
    e.select(col("user_id")).distinct().select(
      concat(lit("cf_"), col("user_id")).as("key"),
      blobFor(col("user_id"), syntheticSpec.filter(_._4 == "user")).as("blob"))

  /** The silver columns produced by the synthetic bronze above, in the
    * reference's projection order. */
  val syntheticFields: Seq[(String, String)] =
    syntheticSpec.map(t => t._1 -> t._2)
}
