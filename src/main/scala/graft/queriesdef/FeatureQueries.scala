package graft.queriesdef

import org.apache.spark.sql.functions._
import graft.QueryRegistry.Entry
import graft.features.FeatureBuilder
import graft.silver.TransactionsAdj

/** Feature-engineering queries (SURVEY.md §2.4 A2-A5, §2.2 P3/P11).
  *
  * The three wide `*_features` queries are the engine's flagship operator:
  * 4 windows × ~34 metrics per grain in one aggregation pass (see
  * FeatureBuilder for the scale rationale). The four small queries isolate
  * each aggregate family (A2/A3/A4/A5) for line-by-line operator parity.
  */
object FeatureQueries {

  private val factHousehold = Oracle.txAdjFull + ",\nfact_rel AS (SELECT * FROM tx)"
  private val factCommodity = Oracle.txCommodity + ",\nfact_rel AS (SELECT * FROM txc)"

  def entries: Seq[Entry] = Seq(

    // A2-A5 + P3, household grain (04a Step 3).
    Entry(
      "household_features",
      (s, dir) => FeatureBuilder.build(TransactionsAdj(s, dir), FeatureBuilder.household),
      Some(FeatureBuilder.buildSql(factHousehold, FeatureBuilder.household))),

    // A2-A5 + P3, commodity grain (04a Step 4).
    Entry(
      "commodity_features",
      (s, dir) => FeatureBuilder.build(
        FeatureBuilder.txWithCommodity(s, dir), FeatureBuilder.commodity),
      Some(FeatureBuilder.buildSql(factCommodity, FeatureBuilder.commodity))),

    // A2-A5 + P3, household×commodity grain (04a Step 5).
    Entry(
      "household_commodity_features",
      (s, dir) => FeatureBuilder.build(
        FeatureBuilder.txWithCommodity(s, dir), FeatureBuilder.householdCommodity),
      Some(FeatureBuilder.buildSql(factCommodity, FeatureBuilder.householdCommodity))),

    // A2-A5 + P3 in strict reference parity mode: `products` is the
    // reference's plain count (04a:194), not the engine-default DISTINCT —
    // the opt-in for audits diffing against reference output verbatim.
    // Engine and oracle render from the SAME flag, so the hash match
    // proves the flag changes exactly the documented metric family.
    Entry(
      "household_features_reference_exact",
      (s, dir) => FeatureBuilder.build(TransactionsAdj(s, dir),
        FeatureBuilder.household, referenceExact = true),
      Some(FeatureBuilder.buildSql(factHousehold, FeatureBuilder.household,
        referenceExact = true))),

    // A2 isolated: grouped multi-aggregate (04a:183-199).
    Entry(
      "feature_agg_core",
      (s, dir) => TransactionsAdj(s, dir)
        .groupBy("household_key")
        .agg(
          countDistinct(col("day")).as("n_days"),
          countDistinct(col("basket_id")).as("n_baskets"),
          count(col("product_id")).as("n_lines"),
          sum(col("units").cast("long")).as("n_units"),
          sum(col("amount_paid").cast("decimal(18,4)")).cast("double").as("sum_paid"),
          sum(col("amount_list").cast("decimal(18,4)")).cast("double").as("sum_list")),
      Some(s"""WITH ${Oracle.txAdjFull}
        |SELECT household_key,
        |  COUNT(DISTINCT day) AS n_days,
        |  COUNT(DISTINCT basket_id) AS n_baskets,
        |  COUNT(product_id) AS n_lines,
        |  CAST(SUM(units) AS BIGINT) AS n_units,
        |  ${Oracle.dsum("amount_paid", "sum_paid")},
        |  ${Oracle.dsum("amount_list", "sum_list")}
        |FROM tx GROUP BY household_key""".stripMargin)),

    // A3 isolated: conditional distinct counts (04a:201-241).
    Entry(
      "feature_cond_distinct",
      (s, dir) => TransactionsAdj(s, dir)
        .groupBy("household_key")
        .agg(
          countDistinct(when(col("instore_discount") > 0.0, col("day"))).as("days_with_instore"),
          countDistinct(when(col("instore_discount") > 0.0, col("basket_id"))).as("baskets_with_instore"),
          countDistinct(when(col("total_coupon_discount") > 0.0, col("product_id"))).as("products_with_coupon")),
      Some(s"""WITH ${Oracle.txAdjFull}
        |SELECT household_key,
        |  COUNT(DISTINCT CASE WHEN instore_discount > 0.0 THEN day END) AS days_with_instore,
        |  COUNT(DISTINCT CASE WHEN instore_discount > 0.0 THEN basket_id END) AS baskets_with_instore,
        |  COUNT(DISTINCT CASE WHEN total_coupon_discount > 0.0 THEN product_id END) AS products_with_coupon
        |FROM tx GROUP BY household_key""".stripMargin)),

    // A4 isolated: conditional counts (04a:243-255).
    Entry(
      "feature_cond_count",
      (s, dir) => TransactionsAdj(s, dir)
        .groupBy("household_key")
        .agg(
          count(when(col("instore_discount") > 0.0, lit(1))).as("lines_with_instore"),
          count(when(col("campaign_coupon_discount") > 0.0, lit(1))).as("lines_with_campaign"),
          count(when(col("manuf_coupon_discount") > 0.0, lit(1))).as("lines_with_manuf")),
      Some(s"""WITH ${Oracle.txAdj}
        |SELECT household_key,
        |  COUNT(CASE WHEN instore_discount > 0.0 THEN 1 END) AS lines_with_instore,
        |  COUNT(CASE WHEN campaign_coupon_discount > 0.0 THEN 1 END) AS lines_with_campaign,
        |  COUNT(CASE WHEN manuf_coupon_discount > 0.0 THEN 1 END) AS lines_with_manuf
        |FROM transactions_adj GROUP BY household_key""".stripMargin)),

    // A5 isolated: days-since with window-start floor (04a:527-546).
    Entry(
      "days_since",
      (s, dir) => {
        val tx = TransactionsAdj(s, dir)
        val (mn, cur) = graft.core.Retail.dayBounds(s, dir)
        val curL = lit(java.sql.Date.valueOf(cur))
        val floorD = datediff(curL, lit(java.sql.Date.valueOf(mn)))
        tx.groupBy("household_key").agg(
          min(datediff(curL, col("day"))).cast("long").as("days_since_any"),
          min(when(col("instore_discount") > 0.0, datediff(curL, col("day")))
            .otherwise(floorD)).cast("long").as("days_since_instore"))
      },
      Some(s"""WITH ${Oracle.txAdj},
        |bounds AS (SELECT min(day) AS mn, max(day) AS cur FROM transactions_adj)
        |SELECT household_key,
        |  CAST(MIN(datediff('day', day, b.cur)) AS BIGINT) AS days_since_any,
        |  CAST(MIN(CASE WHEN instore_discount > 0.0 THEN datediff('day', day, b.cur)
        |    ELSE datediff('day', b.mn, b.cur) END) AS BIGINT) AS days_since_instore
        |FROM transactions_adj CROSS JOIN bounds b
        |GROUP BY household_key""".stripMargin)))
}
