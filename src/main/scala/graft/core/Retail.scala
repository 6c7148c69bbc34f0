package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Role mapping from the TPC-H-ish fixtures (FIXTURES.md §C) onto the
  * reference's retail data model (SURVEY.md §1.3):
  *
  *   transactions fact  = lineitem ⋈ orders  (household = o_custkey)
  *   products dimension = part               (commodity_desc = p_brand)
  *   households         = customer
  *
  * The lineitem⋈orders join is the fixture's stand-in for the fact table
  * itself, so it is performed once here; `orders` is ~1/4 the rows of
  * `lineitem` and joins on its primary key. At scale both sides are large →
  * this is a shuffle hash/sort-merge join on `l_orderkey`; co-locating the
  * two tables by bucketing on orderkey would remove the shuffle entirely.
  */
object Retail {

  /** Raw retail fact: one row per (basket, product) line with the fixture
    * columns renamed into the reference's transaction vocabulary
    * (`01_Data_Prep.py:126-165`). `day` is a DATE (the reference converts
    * int day-numbers at `01:66-72`; the fixture ships timestamps, so the
    * codec here is a timestamp→date truncation — see ingest.DayCodec for
    * the int-anchored variant).
    */
  def transactions(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Catalog.table(spark, sfDir, "lineitem")
    val ord = Catalog.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"), "inner")
      .select(
        col("o_custkey").as("household_key"),
        col("l_orderkey").as("basket_id"),
        to_date(col("l_shipdate")).as("day"),
        col("l_partkey").as("product_id"),
        col("l_suppkey").as("store_id"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("sales_value"),
        col("l_discount").as("retail_disc_rate"),
        col("l_tax").as("coupon_disc_rate"),
        col("l_returnflag").as("return_flag"),
        col("l_linestatus").as("line_status"))
  }

  /** Products dimension: commodity_desc plays the reference's
    * `products.commodity_desc` (`02_Initialize_Solution.py:43`). Small →
    * always broadcast when joined against the fact.
    */
  def products(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "part").select(
      col("p_partkey").as("product_id"),
      col("p_brand").as("commodity_desc"),
      col("p_type").as("sub_commodity_desc"),
      col("p_retailprice").as("list_price"))

  /** Household universe (`04a:93-105` derives it by `distinct()`; the
    * fixture has a real dimension table).
    */
  def households(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "customer")
      .select(col("c_custkey").as("household_key"))

  /** (min, max) transaction day, computed from the fact file alone — the
    * join with orders preserves every line (FK integrity), so these equal
    * bounds over the joined silver table, but the scan reads one 1-column
    * parquet footer-level min/max instead of running the join. This is the
    * driver-side scalar every pipeline stage needs (EP2, SURVEY.md §3).
    */
  def dayBounds(spark: SparkSession, sfDir: String): (java.time.LocalDate, java.time.LocalDate) =
    SilverStore.dayBounds(spark, sfDir) {
      val row = Catalog.table(spark, sfDir, "lineitem")
        .agg(min(to_date(col("l_shipdate"))), max(to_date(col("l_shipdate"))))
        .head()
      require(!row.isNullAt(0),
        s"Retail.dayBounds: lineitem at $sfDir has no rows — cannot derive day bounds")
      (row.getDate(0).toLocalDate, row.getDate(1).toLocalDate)
    }
}
