package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) build — collapse a per-key attribute
  * history into validity intervals: one row per (key, consecutive run of
  * equal attribute values) carrying `valid_from` / `valid_to` (null = the
  * current row) — the dimension-table shape every warehouse keeps for
  * point-in-time joins, and the inverse of the as-of lookup
  * (`train.AsOfLookup` resolves against exactly this kind of table).
  *
  * Gaps-and-islands: a change flag per observation (`attr` differs from
  * its predecessor), a running sum of flags forming the island id, one
  * aggregate per island, then `lead(valid_from)` to close each interval.
  *
  * Scale shape: every window is PARTITIONED BY the key — per-partition
  * row counts are bounded by one key's history length (observation dates),
  * never by table size, so key cardinality scales the plan horizontally.
  * One hash-partition on the key serves the change-flag window, the
  * island aggregate (island id is a per-key refinement — no second
  * fact-level exchange pattern: Spark keeps the key partitioning and
  * sorts within), and the closing `lead`.
  */
object Scd {

  /** Collapse `(key, orderCol, attr)` observations into SCD2 intervals:
    * `key…, attr, valid_from, valid_to, n_obs` where `valid_from` =
    * first observation of the run, `valid_to` = start of the next run
    * (null for the key's current run), `n_obs` = observations in the run.
    */
  def type2(df: DataFrame, keys: Seq[String], orderCol: String,
      attr: String): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val flagged = df
      .withColumn("__prev", lag(col(attr), 1).over(byKey))
      // a null attr equal to a null predecessor is NOT a change (<=> is
      // null-safe); the first observation always opens an island
      .withColumn("__chg",
        when(lag(lit(1), 1).over(byKey).isNull, 1)
          .when(col(attr) <=> col("__prev"), 0).otherwise(1))
      .withColumn("__island", sum(col("__chg")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = flagged
      .groupBy((keys :+ "__island").map(col): _*)
      .agg(
        first(col(attr)).as(attr),
        min(col(orderCol)).as("valid_from"),
        count(lit(1)).as("n_obs"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(keys.map(col): _*).orderBy(col("valid_from"))))
      .select((keys.map(col) :+ col(attr) :+ col("valid_from") :+
        col("valid_to") :+ col("n_obs")): _*)
  }

  /** Point-in-time lookup against an SCD2 dimension: for each spine row
    * `(keys…, asOfCol)`, the attribute interval covering that instant —
    * `valid_from <= asOf < valid_to` (open current interval = null
    * valid_to). Intervals from [[type2]] are disjoint per key, so each
    * spine row matches AT MOST one dimension row — the join needs no
    * argmax/window; spine rows before the key's first interval survive
    * with null attributes (left outer).
    *
    * Scale shape: an equi-join on the keys with the interval bound as a
    * join-level predicate — shuffles on the key columns, per-key fan-out
    * bounded by that key's interval count (attribute churn), never table
    * size. The same plan shape as the event-interval joins, applied to
    * the warehouse dimension.
    */
  def pitLookup(spine: DataFrame, dim: DataFrame, keys: Seq[String],
      asOfCol: String): DataFrame = {
    val d = dim.withColumnsRenamed(
      keys.map(k => k -> s"__d_$k").toMap)
    val keyCond = keys.map(k => spine(k) === d(s"__d_$k"))
      .reduce(_ && _)
    val cond = keyCond &&
      d("valid_from") <= spine(asOfCol) &&
      (d("valid_to").isNull || spine(asOfCol) < d("valid_to"))
    spine.join(d, cond, "left_outer")
      .drop(keys.map(k => s"__d_$k"): _*)
  }
}
