package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-anonymity suppression for published aggregates — the privacy gate a
  * data-release pipeline runs before any grouped statistic leaves the
  * platform: a group whose support (distinct contributing units) is below
  * `k` is not published under its own key; its contribution is rolled into
  * a single `__OTHER__` bucket so the released table still totals
  * correctly while no cell identifies fewer than `k` units.
  *
  * Scale shape: two hash aggregates — the per-group pass (map-side
  * combinable), then a re-aggregate over the relabeled keys; the second
  * pass runs on the GROUP table (dimension-sized), not the facts. The
  * distinct-unit support count uses exact `countDistinct` per group in the
  * first pass; the rolled-up `__OTHER__` support is the count of distinct
  * units across suppressed groups, NOT the sum of their supports (a unit
  * in two rare groups must count once), so the suppressed slice — and
  * only that slice — takes one extra distinct aggregate over its facts.
  */
object KAnon {

  /** Publish `sum(valueCol)` by `groupCols` with k-anonymity on distinct
    * `unitCol` support. Output: groupCols (suppressed rows relabeled
    * `__OTHER__`), `n_units`, `total`.
    */
  def suppress(df: DataFrame, groupCols: Seq[String], unitCol: String,
      valueCol: String, k: Int): DataFrame = {
    require(groupCols.nonEmpty && k >= 1, s"bad args: $groupCols, $k")
    val keys = groupCols.map(col)
    val grouped = df.groupBy(keys: _*).agg(
      countDistinct(col(unitCol)).as("n_units"),
      sum(col(valueCol).cast("decimal(18,4)")).as("total_d"))
    val kept = grouped.filter(col("n_units") >= k)
      .select(keys :+ col("n_units") :+
        col("total_d").cast("double").as("total"): _*)
    // suppressed slice: re-derive support from the fact rows of the rare
    // groups (semi join on the rare keys) so a unit spanning several rare
    // groups is counted once in __OTHER__
    val rareKeys = grouped.filter(col("n_units") < k).select(keys: _*)
    val rareFacts = df.join(broadcast(rareKeys), groupCols, "left_semi")
    val other = rareFacts.agg(
      countDistinct(col(unitCol)).as("n_units"),
      sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("total"))
      .filter(col("n_units") > 0)
      .select(groupCols.map(c => lit("__OTHER__").as(c)) :+
        col("n_units") :+ col("total"): _*)
    kept.unionByName(other)
  }
}
