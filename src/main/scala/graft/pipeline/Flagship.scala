package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Commodities
import graft.silver.TransactionsAdj

/** The flagship end-to-end slice used by SparkEntry.entry (driver t1 smoke):
  * silver ingest → commodity selection → per-(household, commodity) spend
  * summary. Upgraded to the full feature→train→score pipeline as those
  * stages land.
  */
object Flagship {
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val tx = TransactionsAdj(spark, sfDir)
    val products = graft.core.Retail.products(spark, sfDir)
      .select("product_id", "commodity_desc")
    val cts = Commodities.commoditiesToScore(spark, sfDir)
    tx.join(broadcast(products), Seq("product_id"))
      .join(broadcast(cts), Seq("commodity_desc"))
      .groupBy("household_key", "commodity_desc")
      .agg(
        sum(col("amount_paid")).as("spend"),
        countDistinct(col("basket_id")).as("baskets"))
  }
}
