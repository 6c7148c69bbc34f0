package graft.silver

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Retail

/** Silver-layer adjusted-transactions projection.
  *
  * Re-expresses the reference's `transactions_adj` CTAS
  * (`01_Data_Prep.py:121-166`): a single wide projection over the raw fact
  * that decomposes list price into named discount buckets with
  * CASE WHEN / COALESCE (SURVEY.md S4, P8, P9, F7) and derives the paid
  * amount. On the fixture mapping the two per-row rates
  * (`l_discount` → in-store, `l_tax` → coupon) play the reference's
  * retail/coupon discount columns.
  *
  * Fixture-bounded departure: the reference decomposes from THREE raw
  * discount columns (`retail_disc`, `coupon_disc`, `coupon_match_disc`,
  * `01:144-163`), where a non-zero match discount reclassifies the
  * coupon as manufacturer-matched. The fixture exposes only two rate
  * columns, so the match bucket has no source signal here; rather than
  * fake one, the campaign/manufacturer split is driven by the coupon
  * rate alone and `total_coupon_discount` remains the exact sum of the
  * two coupon buckets, preserving every downstream invariant.
  *
  * Everything is ONE `select` — not a chain of `withColumn`s — so the plan
  * has a single Project node and one whole-stage-codegen span regardless of
  * how many derived columns are added (SURVEY.md §4 "100-line projection
  * chains").
  */
object TransactionsAdj {

  /** Derived columns, declared as data so callers (and tests) can see the
    * exact formulas. Float arithmetic is written with explicit association
    * so the DuckDB oracle computes bit-identical doubles.
    */
  def derivedColumns: Seq[(String, Column)] = {
    val price = col("sales_value")
    val instore = coalesce(
      when(col("retail_disc_rate") > 0.0, price * col("retail_disc_rate")),
      lit(0.0))
    val campaign = coalesce(
      when(col("coupon_disc_rate") >= 0.05, price * col("coupon_disc_rate")),
      lit(0.0))
    val manuf = coalesce(
      when(col("coupon_disc_rate") > 0.0 && col("coupon_disc_rate") < 0.05,
        price * col("coupon_disc_rate")),
      lit(0.0))
    val totalCoupon = campaign + manuf
    Seq(
      "amount_list" -> price,
      "instore_discount" -> instore,
      "campaign_coupon_discount" -> campaign,
      "manuf_coupon_discount" -> manuf,
      "total_coupon_discount" -> totalCoupon,
      "amount_paid" -> (price - instore - totalCoupon))
  }

  def keyColumns: Seq[String] =
    Seq("household_key", "basket_id", "day", "product_id", "store_id")

  /** The silver table: keys + units + week_no + the derived money columns.
    * Routed through SilverStore: when the harness (or a library user)
    * enables it, this is ONE materialized bucketed table per session —
    * the reference's physical `transactions_adj` — instead of a
    * re-derived join per query.
    */
  def apply(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.SilverStore.silver(spark, sfDir)(derive(spark, sfDir))

  /** The underlying silver projection (always re-derived). */
  def derive(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Retail.transactions(spark, sfDir)
    val cols =
      keyColumns.map(col) ++
        Seq(weekofyear(col("day")).as("week_no"),
          col("quantity").cast("int").as("units")) ++
        derivedColumns.map { case (n, c) => c.as(n) }
    base.select(cols: _*)
  }
}
