package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for grouped algebraic aggregates — the
  * "never rescan the base" pattern every warehouse-scale rollup needs.
  * The reference recomputes each feature table from the full fact daily
  * (`03_Define_Workflow.py:96-99` daily recompute); at 100 TB the fact
  * scan IS the job, so lifetime totals must instead be maintained from
  * the stored snapshot plus the day's delta.
  *
  * The snapshot stores PARTIALS, not finished values: count, exact
  * DECIMAL sum, min, max per key — each a commutative monoid, so
  *
  *   merge(snapshot(base), partials(delta)) == partials(base ∪ delta)
  *
  * holds exactly (decimal addition is associative; min/max trivially).
  * Finished values (double sum, average) are derived only at read time
  * by [[finish]]. The `ivm_household_totals` oracle hash-proves the
  * merge against a full recompute over the union — the same
  * "decomposition proven by hash equality" treatment as the mergeable
  * sketches ([[QuantileSketch]], `sketch_distinct_merge`), but exact.
  *
  * Scale shape: `partials` is one map-side-combinable hash aggregate
  * over the delta only; `merge` unions snapshot rows (|keys| rows, not
  * data) with delta partials and re-aggregates — the shuffle carries
  * live keys, never history. Distinct counts are NOT algebraic and
  * deliberately absent — that is what the HLL-sketch twin is for.
  */
object Ivm {

  /** Grouped partials of `valueCol` (money double) and `dayCol`:
    * n_rows, exact decimal sum, first/last day.
    */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String,
      dayCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      sum(col(valueCol).cast("decimal(18,4)")).as("value_dec"),
      min(col(dayCol)).as("first_day"),
      max(col(dayCol)).as("last_day"))

  /** Combine partial frames (same schema as [[partials]] output) into
    * one: the monoid merge. Any number of snapshots/deltas, any order.
    */
  def merge(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "Ivm.merge: at least one partial frame")
    val keys = parts.head.columns
      .filterNot(Set("n_rows", "value_dec", "first_day", "last_day"))
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("value_dec")).as("value_dec"),
        min(col("first_day")).as("first_day"),
        max(col("last_day")).as("last_day"))
  }

  /** Read boundary: surface the partials as finished analyst-facing
    * values (double total, 9-dp average) — the only place decimals
    * leave the lineage.
    */
  def finish(merged: DataFrame): DataFrame =
    merged.select(
      merged.columns.filterNot(
          Set("n_rows", "value_dec", "first_day", "last_day")).map(col) ++
        Seq(
          col("n_rows"),
          col("value_dec").cast("double").as("total_value"),
          round(col("value_dec").cast("double") /
            col("n_rows").cast("double"), 9).as("avg_value"),
          col("first_day"), col("last_day")): _*)
}
