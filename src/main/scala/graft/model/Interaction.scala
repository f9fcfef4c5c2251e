package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed silver row — `Dataset[Interaction]` surface over the 25-column
  * AliCCP schema (SURVEY.md §1.4). All feature fields are optional ints
  * (sparse KV source: absent field -> None), matching the nullable wide
  * table the reference produces. */
case class Interaction(
    sample_id: Long,
    user_id: Option[Int], user_categories: Option[Int],
    user_shops: Option[Int], user_brands: Option[Int],
    user_intentions: Option[Int], user_profile: Option[Int],
    user_group: Option[Int], user_gender: Option[Int],
    user_age: Option[Int], user_consumption_1: Option[Int],
    user_consumption_2: Option[Int], user_is_occupied: Option[Int],
    user_geography: Option[Int], item_id: Option[Int],
    item_category: Option[Int], item_shop: Option[Int],
    item_intention: Option[Int], item_brand: Option[Int],
    user_item_categories: Option[Int], user_item_shops: Option[Int],
    user_item_brands: Option[Int], user_item_intentions: Option[Int],
    position: Option[Int], click: Option[Int], conversion: Option[Int])

object Interaction {
  /** Type the wide silver DataFrame (column order per
    * [[Aliccp.silverFields]], as produced by BronzeSilver.toSilver). */
  def typed(silver: DataFrame)(implicit spark: SparkSession): Dataset[Interaction] = {
    import spark.implicits._
    silver.as[Interaction]
  }
}
