package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.parse.AliccpCodec._

/** The reference's Bronze->Silver spine as one native pipeline: KV-blob
  * parse -> left join skeleton⋈common on the common-feature key -> invalid
  * -sample filter -> typed wide projection.
  *
  * Reference: /root/reference/data_processing/batch_processing/
  * batch_process_Bronze_to_Silver.py — join :182-184, filter :186-187
  * (drop rows with click=0 AND conversion=1), merge-parse :188-192 with
  * skeleton-wins-over-common precedence (dict.update :81), projection
  * :206-300.
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
    * name (SURVEY.md §1.4); click/conversion are injected into the merged
    * map exactly like the reference's process_csv_line_2. */
  def toSilver(skeleton: DataFrame, common: DataFrame,
               fields: Seq[(String, String)]): DataFrame = {
    val joined = skeleton.join(
      broadcast(common.withColumnRenamed("blob", "common_blob")), Seq("key"), "left")
      // keep iff NOT (click = 0 AND conversion = 1) — invalid conversion
      // without click (batch_process_Bronze_to_Silver.py:186-187)
      .filter(col("click") =!= 0 || col("conversion") =!= 1)
    val merged = mergeKv(
      parseKvFast(col("common_blob")),
      parseKvFast(col("blob")),
      map(lit("click"), col("click").cast("string"),
          lit("conversion"), col("conversion").cast("string")))
    joined.select(
      col("sample_id") +:
        fields.map { case (id, name) => field(merged, id, name) } :+
        try_element_at(merged, lit("click")).cast("int").as("click") :+
        try_element_at(merged, lit("conversion")).cast("int").as("conversion"): _*)
  }

  /** Deterministic bronze synthesis from the `events` fixture — the unit/
    * oracle harness for [[toSilver]] (the real AliCCP CSVs are not in this
    * container). Field values are simple functions of the typed columns so
    * a relational oracle can recompute the expected silver table. */
  def skeletonFromEvents(e: DataFrame): DataFrame =
    e.select(
      col("event_id").as("sample_id"),
      (col("event_id") % 3 === 0).cast("int").as("click"),
      (col("event_id") % 5 === 0).cast("int").as("conversion"),
      concat(lit("cf_"), col("user_id")).as("key"),
      concat(
        lit("205"), lit(KvSep), (col("event_id") % 1000).cast("string"),
        lit(WeightSep), lit("1.0"), lit(RecSep),
        lit("206"), lit(KvSep), (col("event_id") % 50).cast("string"),
        lit(WeightSep), lit("1.0")).as("blob"))

  def commonFromEvents(e: DataFrame): DataFrame =
    e.select(col("user_id")).distinct().select(
      concat(lit("cf_"), col("user_id")).as("key"),
      concat(
        lit("101"), lit(KvSep), col("user_id").cast("string"),
        lit(WeightSep), lit("1.0"), lit(RecSep),
        lit("121"), lit(KvSep), (col("user_id") % 11).cast("string"),
        lit(WeightSep), lit("1.0"), lit(RecSep),
        lit("124"), lit(KvSep), (col("user_id") % 2).cast("string"),
        lit(WeightSep), lit("1.0"), lit(RecSep),
        lit("125"), lit(KvSep), (col("user_id") % 7).cast("string"),
        lit(WeightSep), lit("1.0")).as("blob"))

  /** The silver columns produced by the synthetic bronze above. */
  val syntheticFields: Seq[(String, String)] = Seq(
    "101" -> "user_id", "121" -> "user_profile", "124" -> "user_gender",
    "125" -> "user_age", "205" -> "item_id", "206" -> "item_category")
}
