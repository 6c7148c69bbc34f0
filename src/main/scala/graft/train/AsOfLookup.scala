package graft.train

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** True point-in-time (as-of) feature lookup.
  *
  * The reference deliberately avoids this: its Feature Store's
  * time-series lookup was "very slow", so it put `day` in the PK and did
  * exact-match joins (`04a:599`). This operator supplies the real
  * semantics — for each spine row, the latest feature snapshot with
  * `snapshot.day <= spine.day` — as a composition Spark handles well:
  *
  *   equi-join on the grain keys (hash join, one shuffle)
  *     → filter snapshot.day <= spine.day
  *     → row_number over (spine keys, spine day) ordered by snapshot day desc
  *     → keep rank 1
  *
  * Scale: the join fans out spine × snapshots-per-key, which is bounded by
  * the snapshot retention (e.g. 30 daily snapshots), NOT by table size —
  * so the blow-up factor is a small constant and the window dedup runs on
  * already co-partitioned data (same keys as the join ⇒ no extra
  * shuffle). This is exactly the plan a native as-of merge join would
  * produce, minus a sort — and it needs no custom SparkStrategy.
  * DuckDB's native ASOF JOIN is the oracle.
  */
object AsOfLookup {

  /** Left as-of join: every spine row survives; feature columns are null
    * when no snapshot precedes the spine day (caller decides fill).
    * `snapshotDayAs` exposes which snapshot day matched.
    */
  def lookupAsOf(spine: DataFrame, snapshots: DataFrame, grainKeys: Seq[String],
      snapshotDayAs: String = "snapshot_day"): DataFrame = {
    val metricCols = snapshots.columns.toSeq.filterNot(grainKeys.contains)
      .filterNot(_ == "day")
    val f = snapshots.select(
      grainKeys.map(col) ++ (col("day").as(snapshotDayAs) +: metricCols.map(col)): _*)
    // Rank-1 must be taken PER SPINE ROW, not per (grainKeys, day):
    // duplicate spine rows (same keys+day, different payload) would
    // otherwise collapse into one survivor. A unique per-row id makes
    // the window partition the spine row itself — matching ASOF JOIN
    // semantics, where every left row is matched independently.
    val sp = spine.withColumn("__spine_id", monotonically_increasing_id()).alias("sp")
    val ff = f.alias("ff")
    // temporal predicate INSIDE the join condition so a spine row whose
    // snapshots are all in the future still survives (with nulls)
    val cond = grainKeys.map(k => col(s"sp.$k") === col(s"ff.$k")).reduce(_ && _) &&
      col(s"ff.$snapshotDayAs") <= col("sp.day")
    val joined = sp.join(ff, cond, "left_outer").select(
      col("sp.__spine_id") +: (spine.columns.toSeq.map(c => col(s"sp.$c")) ++
        (col(s"ff.$snapshotDayAs") +: metricCols.map(c => col(s"ff.$c")))): _*)
    val w = Window.partitionBy(col("__spine_id"))
      .orderBy(col(snapshotDayAs).desc_nulls_last)
    joined.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk", "__spine_id")
  }
}
