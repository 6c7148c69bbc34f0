package graft.features

import java.time.LocalDate
import java.sql.Date
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Declarative metric catalog for the feature builder.
  *
  * The reference builds ~90 metrics per window as 268 lines of sequential
  * `withColumn`s (`04a:183-525`); here each metric is DATA — a name, a
  * Spark `Column`, and the equivalent DuckDB SQL — generated from one list
  * of definitions. One generated `select` = one Project node = one
  * whole-stage-codegen span, and the oracle SQL can never drift from the
  * Spark expression because both render from the same definition.
  *
  * Aggregate conventions (see queriesdef.Oracle): money sums go through
  * DECIMAL(18,4); conditional distinct counts are
  * `countDistinct(when(cond, k))` (SURVEY.md A3); recency is
  * `min(datediff)` floored at the window start (A5, `04a:534-544`).
  */
object MetricDefs {

  /** One aggregate output: Spark expression + DuckDB SQL over the fact. */
  final case class AggDef(name: String, col: Column, sql: String)

  /** One post-aggregation (ratio) output over the cleaned agg columns. */
  final case class PostDef(name: String, col: Column, sql: String)

  /** Discount buckets decomposed by the silver layer; each acts as a
    * "flag metric" for the conditional aggregates (`04a:201-255`).
    */
  val flagMetrics: Seq[String] =
    Seq("instore_discount", "campaign_coupon_discount", "manuf_coupon_discount")

  val moneyMetrics: Seq[String] = Seq(
    "amount_list", "instore_discount", "campaign_coupon_discount",
    "manuf_coupon_discount", "total_coupon_discount", "amount_paid")

  /** instore_discount → instore, campaign_coupon_discount → campaign, … */
  private def shortName(m: String): String =
    m.stripSuffix("_discount").stripSuffix("_coupon")

  private def dlit(d: LocalDate): Column = lit(Date.valueOf(d))

  /** All aggregates for one window, computed in a single grouped pass:
    * the window filter is folded into every aggregate (`when(inWin, …)`)
    * instead of the reference's filter-then-aggregate-then-join-4-windows
    * chain — one shuffle for all windows (scale redesign, SURVEY.md §4).
    */
  def aggsFor(w: WindowDef, cur: LocalDate,
      approxDistinct: Boolean = false): Seq[AggDef] = {
    // the approx variant swaps exact distinct counts for HLL sketches —
    // the 100 TB escape hatch for the multi-distinct Expand (SURVEY.md §4);
    // not oracle-exact, so only non-oracle callers set it
    def cdist(c: Column) =
      if (approxDistinct) approx_count_distinct(c) else countDistinct(c)
    val inWin = col("day").between(dlit(w.start), dlit(w.end))
    val inWinSql = s"day BETWEEN ${w.startSql} AND ${w.endSql}"
    val s = w.name

    // A2: base multi-aggregates
    val base = Seq(
      AggDef(s"days_$s", cdist(when(inWin, col("day"))),
        s"COUNT(DISTINCT CASE WHEN $inWinSql THEN day END)"),
      AggDef(s"baskets_$s", cdist(when(inWin, col("basket_id"))),
        s"COUNT(DISTINCT CASE WHEN $inWinSql THEN basket_id END)"),
      AggDef(s"products_$s", cdist(when(inWin, col("product_id"))),
        s"COUNT(DISTINCT CASE WHEN $inWinSql THEN product_id END)"),
      AggDef(s"line_items_$s", count(when(inWin, lit(1))),
        s"COUNT(CASE WHEN $inWinSql THEN 1 END)"),
      AggDef(s"units_$s", sum(when(inWin, col("units"))),
        s"SUM(CASE WHEN $inWinSql THEN units END)"))

    // A2: money sums (exact decimal accumulation)
    val money = moneyMetrics.map { m =>
      AggDef(s"${m}_$s",
        sum(when(inWin, col(m)).cast("decimal(18,4)")).cast("double"),
        s"CAST(SUM(CAST(CASE WHEN $inWinSql THEN $m END AS DECIMAL(18,4))) AS DOUBLE)")
    }

    // A3: conditional distinct counts — 3 flag metrics × 3 entities
    val condDistinct = flagMetrics.flatMap { m =>
      val short = shortName(m)
      Seq("day" -> "days", "basket_id" -> "baskets", "product_id" -> "products")
        .map { case (k, kn) =>
          AggDef(s"${kn}_with_${short}_$s",
            cdist(when(inWin && col(m) > 0.0, col(k))),
            s"COUNT(DISTINCT CASE WHEN $inWinSql AND $m > 0.0 THEN $k END)")
        }
    }

    // A4: conditional counts
    val condCount = flagMetrics.map { m =>
      val short = shortName(m)
      AggDef(s"lines_with_${short}_$s",
        count(when(inWin && col(m) > 0.0, lit(1))),
        s"COUNT(CASE WHEN $inWinSql AND $m > 0.0 THEN 1 END)")
    }

    // A5: recency (days since last event), floored at window start —
    // the reference's string−date coercion (`04a:534-544`) made explicit
    // with datediff on both sides.
    val sinceFloor = datediff(dlit(cur), dlit(w.start))
    val sinceFloorSql = s"datediff('day', ${w.startSql}, b.cur)"
    val daysSince =
      AggDef(s"days_since_$s",
        min(when(inWin, datediff(dlit(cur), col("day"))).otherwise(sinceFloor)),
        s"MIN(CASE WHEN $inWinSql THEN datediff('day', day, b.cur) ELSE $sinceFloorSql END)") +:
        flagMetrics.map { m =>
          val short = shortName(m)
          AggDef(s"days_since_${short}_$s",
            min(when(inWin && col(m) > 0.0, datediff(dlit(cur), col("day")))
              .otherwise(sinceFloor)),
            s"MIN(CASE WHEN $inWinSql AND $m > 0.0 THEN datediff('day', day, b.cur) ELSE $sinceFloorSql END)")
        }

    base ++ money ++ condDistinct ++ condCount ++ daysSince
  }

  /** Null-safe ratio shared by both renderers. */
  private def ratio(name: String, num: String, den: String): PostDef =
    PostDef(name,
      when(col(den) =!= 0.0, col(num) / col(den)).otherwise(0.0),
      s"CASE WHEN $den <> 0.0 THEN $num / $den ELSE 0.0 END")

  /** P3: derived ratio features over one window's cleaned aggregates.
    * `products_per_day_${s}_$s` reproduces the reference's double-window-
    * suffix quirk (`04a:263-266` suffixes inline, the rename loop at
    * `04a:555-559` suffixes again) — kept for parity, flagged here.
    */
  def ratiosFor(w: WindowDef): Seq[PostDef] = {
    val s = w.name
    Seq(
      ratio(s"paid_per_basket_$s", s"amount_paid_$s", s"baskets_$s"),
      ratio(s"paid_per_day_$s", s"amount_paid_$s", s"days_$s"),
      ratio(s"paid_per_line_$s", s"amount_paid_$s", s"line_items_$s"),
      ratio(s"units_per_basket_$s", s"units_$s", s"baskets_$s"),
      ratio(s"lines_per_basket_$s", s"line_items_$s", s"baskets_$s"),
      ratio(s"products_per_day_${s}_$s", s"products_$s", s"days_$s"),
      ratio(s"discount_rate_$s", s"total_coupon_discount_$s", s"amount_list_$s"),
      ratio(s"instore_rate_$s", s"instore_discount_$s", s"amount_list_$s"),
      ratio(s"paid_share_$s", s"amount_paid_$s", s"amount_list_$s"))
  }
}
