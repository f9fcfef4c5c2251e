package graft.model

import org.apache.spark.sql.types._

/** The AliCCP schema contract (SURVEY.md §1.4) — the full field-id ->
  * column mapping extracted at
  * /root/reference/data_processing/batch_processing/
  * batch_process_Bronze_to_Silver.py:206-300, and the Gold column set
  * (batch_process_Silver_to_Gold.py:83-96, postgreSQL/create_table.py:22-44).
  */
object Aliccp {

  /** field id -> silver column, in the reference's projection order. */
  val silverFields: Seq[(String, String)] = Seq(
    "101" -> "user_id",
    "109_14" -> "user_categories",
    "110_14" -> "user_shops",
    "127_14" -> "user_brands",
    "150_14" -> "user_intentions",
    "121" -> "user_profile",
    "122" -> "user_group",
    "124" -> "user_gender",
    "125" -> "user_age",
    "126" -> "user_consumption_1",
    "127" -> "user_consumption_2",
    "128" -> "user_is_occupied",
    "129" -> "user_geography",
    "205" -> "item_id",
    "206" -> "item_category",
    "207" -> "item_shop",
    "210" -> "item_intention",
    "216" -> "item_brand",
    "508" -> "user_item_categories",
    "509" -> "user_item_shops",
    "702" -> "user_item_brands",
    "853" -> "user_item_intentions",
    "301" -> "position")

  /** 25-column silver schema: the 23 mapped fields + click/conversion. */
  val silverSchema: StructType = StructType(
    silverFields.map { case (_, c) => StructField(c, IntegerType) } ++
      Seq(StructField("click", IntegerType),
        StructField("conversion", IntegerType)))

  /** Gold keeps 17 of the silver columns (drops user_consumption_1,
    * item_intention, user_item_*, position, conversion —
    * batch_process_Silver_to_Gold.py:83-96). */
  val goldKeep: Seq[String] = Seq(
    "user_id", "item_id", "item_category", "item_shop", "item_brand",
    "user_shops", "user_profile", "user_group", "user_gender", "user_age",
    "user_consumption_2", "user_is_occupied", "user_geography",
    "user_intentions", "user_brands", "user_categories", "click")

  /** The 16 categorical columns the reference frequency-indexes
    * (batch_process_Silver_to_Gold.py:106-117). */
  val goldIndexCols: Seq[String] = goldKeep.filterNot(_ == "click")

  /** Raw-copy columns (batch_process_Silver_to_Gold.py:95-96). */
  val goldRawCopy: Seq[String] = Seq("user_id", "item_id")
}
