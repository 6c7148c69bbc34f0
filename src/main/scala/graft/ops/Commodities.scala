package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Retail
import graft.silver.TransactionsAdj

/** Commodity selection — the reference's `02_Initialize_Solution.py`.
  *
  * `topCommodities` is SURVEY.md A7/O1/J1: fact ⋈ small dim (broadcast) →
  * hash aggregate with a distinct count → top-k. Spark plans the limit as
  * `TakeOrderedAndProject`, so the full sorted result never materializes —
  * the right shape at 100 TB (k rows per partition → k rows total).
  *
  * `commoditiesToScore` adds the reference's name sanitation
  * (`02:61-62`, SURVEY.md F5): regexp_replace of punctuation then spaces →
  * `_`, producing `commodity_clean` used as a model id / column name.
  */
object Commodities {

  def topCommodities(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val tx = TransactionsAdj(spark, sfDir)
    val products = Retail.products(spark, sfDir)
      .select("product_id", "commodity_desc")
    tx.join(broadcast(products), Seq("product_id"), "inner")
      .groupBy("commodity_desc")
      .agg(countDistinct(col("basket_id")).as("baskets"))
      .orderBy(desc("baskets"), asc("commodity_desc"))
      .limit(k)
  }

  /** The to-score control table. When SilverStore is enabled this is
    * materialized once per (session, fixture) as a local relation —
    * mirroring the reference, which persists `commodities_to_score`
    * physically at init (`02:57-71`) and never re-aggregates it.
    */
  def commoditiesToScore(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame =
    graft.core.SilverStore.control(spark, sfDir, s"commodities_to_score_$k") {
      topCommodities(spark, sfDir, k)
        .select(
          col("commodity_desc"),
          regexp_replace(
            regexp_replace(col("commodity_desc"), """[-\|\\/:;,."']""", "_"),
            " ", "_").as("commodity_clean"))
    }
}
