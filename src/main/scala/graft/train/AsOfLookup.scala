package graft.train

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** True point-in-time (as-of) feature lookup.
  *
  * The reference deliberately avoids this: its Feature Store's
  * time-series lookup was "very slow", so it put `day` in the PK and did
  * exact-match joins (`04a:599`). This operator supplies the real
  * semantics — for each spine row, the latest feature snapshot with
  * `snapshot.day <= spine.day` — as a composition Spark handles well:
  *
  *   equi-join on the grain keys (hash join, one shuffle)
  *     → temporal predicate inside the join condition
  *     → per-spine-row `max(struct(snapshot_day, metrics…))`
  *
  * The per-row argmax is a partial-aggregable `max(struct)` keyed by a
  * unique spine-row id, NOT a `row_number` window: the aggregate combines
  * map-side before any exchange (no sort, no full-fan-out shuffle), and
  * keying by spine ROW — rather than by (grain keys, day) — means
  * duplicate spine rows each survive with their own match, exactly like
  * a native ASOF JOIN's left rows. Struct ordering breaks nothing:
  * snapshots are PK-unique per (keys, day), so the leading
  * `snapshot_day` field alone decides, and the all-null struct from an
  * unmatched left-outer row loses to any real match (null orders first).
  *
  * Scale: the join fans out spine × snapshots-per-key, which is bounded
  * by the snapshot retention (e.g. 30 daily snapshots), NOT by table
  * size — a small constant blow-up reduced right back map-side.
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
    val sp = spine.withColumn("__spine_id", monotonically_increasing_id()).alias("sp")
    val ff = f.alias("ff")
    // temporal predicate INSIDE the join condition so a spine row whose
    // snapshots are all in the future still survives (with nulls)
    val cond = grainKeys.map(k => col(s"sp.$k") === col(s"ff.$k")).reduce(_ && _) &&
      col(s"ff.$snapshotDayAs") <= col("sp.day")
    val payload = struct(
      col(s"ff.$snapshotDayAs").as(snapshotDayAs) +:
        metricCols.map(c => col(s"ff.$c").as(c)): _*)
    val spineCols = spine.columns.toSeq
    sp.join(ff, cond, "left_outer")
      .groupBy(col("sp.__spine_id"))
      .agg(
        first(col(s"sp.${spineCols.head}")).as(spineCols.head),
        spineCols.tail.map(c => first(col(s"sp.$c")).as(c)) :+
          max(payload).as("__best"): _*)
      .select(
        spineCols.map(col) ++
          (col(s"__best.$snapshotDayAs").as(snapshotDayAs) +:
            metricCols.map(c => col(s"__best.$c").as(c))): _*)
  }
}
