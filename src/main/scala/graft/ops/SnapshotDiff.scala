package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — what changed between two versions of a keyed
  * aggregate (daily feature snapshots, sliding activity windows): per key,
  * the metric under snapshot A and snapshot B plus a status
  * (`added` / `removed` / `changed` / `unchanged`).
  *
  * Scale shape: when both snapshots derive from one fact table (the common
  * case — two time windows over the same events), the naive form is two
  * aggregations FULL OUTER joined on the key: three shuffles and a wide
  * join. This operator instead aggregates ONCE with conditional
  * (`CASE WHEN in-window`) aggregates per side — a single hash-partition of
  * the facts, map-side partials intact, no join at all. The status column
  * is then plain row-local arithmetic. Comparing the per-side sums is
  * exact: both route through DECIMAL, so `changed` is never tripped by
  * float combine order. (Reconciling two separately MATERIALIZED tables
  * still needs the full-outer form — this is the one-table fast path.)
  */
object SnapshotDiff {

  /** Per-`keys` counts and decimal-exact `value` sums under membership
    * predicates `inA`/`inB`, with the reconciliation status. Rows outside
    * both snapshots are filtered before the aggregate.
    */
  def diff(df: DataFrame, keys: Seq[String], value: Column,
      inA: Column, inB: Column): DataFrame =
    df.filter(inA || inB)
      .groupBy(keys.map(col): _*)
      .agg(
        count(when(inA, 1)).as("n_a"),
        sum(when(inA, value).cast("decimal(18,4)")).cast("double").as("amt_a"),
        count(when(inB, 1)).as("n_b"),
        sum(when(inB, value).cast("decimal(18,4)")).cast("double").as("amt_b"))
      .withColumn("status",
        when(col("n_a") === 0, "added")
          .when(col("n_b") === 0, "removed")
          .when(col("n_a") =!= col("n_b") || col("amt_a") =!= col("amt_b"),
            "changed")
          .otherwise("unchanged"))
}
