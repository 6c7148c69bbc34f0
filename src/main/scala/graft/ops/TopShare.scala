package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-p ("nucleus") truncation: keep, per group, the smallest
  * weight-descending prefix of items whose cumulative weight reaches p%
  * of the group total — the distribution-head selector (keep the
  * products carrying 80% of a category's spend; keep the domains
  * carrying 95% of a crawl). The share-targeted complement to
  * [[CapPerGroup]]'s fixed-count quotas and the per-row filter
  * `quality_top_share`'s rank cut.
  *
  * Exactness: the keep rule is pure integer-scaled decimal arithmetic —
  * keep ⟺ 100·cum_before < p·total over exact DECIMAL sums (no doubles
  * in the decision), so membership is engine-exact; the reported
  * cumulative share closes as one double division per row, quantized to
  * the suite's 9-dp convention ([[Round9]]) so the only non-decimal
  * output column cannot drift by an ulp across engines. The prefix
  * rule keeps at least one item per group (cum_before = 0 < p·total for
  * any positive total).
  *
  * Scale shape: one map-combinable (group, item) pre-aggregate, then a
  * single window pass partitioned by group ordered by (weight desc,
  * item) — parallelism grows with the group count, and the frame is a
  * running sum (linear, never the O(n²) unbounded-following shape).
  */
object TopShare {

  /** Keep the top-p% prefix per group. Input must already be one row per
    * (group, item) with a `weight` DECIMAL-safe column. Output:
    * (group cols..., item, weight, rank, cum_share) for kept rows.
    */
  def nucleusPerGroup(df: DataFrame, groupCols: Seq[String],
      itemCol: String, weightCol: String, pPct: Int): DataFrame = {
    require(pPct > 0 && pPct <= 100, s"TopShare: pPct in (0,100], got $pPct")
    val gs = groupCols.map(col)
    val w = Window.partitionBy(gs: _*)
      .orderBy(col(weightCol).desc, col(itemCol))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.partitionBy(gs: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val dw = col(weightCol).cast("decimal(18,4)")
    df
      .withColumn("__w", dw)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(col("__w")).over(run).cast("decimal(28,4)"))
      .withColumn("__tot", sum(col("__w")).over(whole).cast("decimal(28,4)"))
      // exact-integer decision: 100·(cum − w) < p·total
      .filter((col("__cum") - col("__w")) * 100 < col("__tot") * pPct)
      .select(gs ++ Seq(col(itemCol), col("__w").as(weightCol), col("rank"),
        round(col("__cum").cast("double") / col("__tot").cast("double"), 9)
          .as("cum_share")): _*)
  }
}
