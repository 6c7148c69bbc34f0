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
  * The per-row argmax is a partial-aggregable `max(struct)` keyed by the
  * spine row's CONTENT, NOT a `row_number` window and NOT a synthetic
  * `monotonically_increasing_id`: the aggregate combines map-side before
  * any exchange (no sort, no full-fan-out shuffle), and content keys are
  * stable under partial-stage recomputation — a retried or speculated
  * task reproduces the same keys, where a synthetic id depends on
  * partition index and intra-partition order and can silently duplicate
  * or drop as-of rows. Duplicate spine rows are handled by carrying a
  * multiplicity: identical rows collapse before the join (shrinking its
  * fan-out) and re-expand afterwards, so each survives with its own
  * match, exactly like a native ASOF JOIN's left rows. Struct ordering
  * breaks nothing: snapshots are PK-unique per (keys, day), so the
  * leading `snapshot_day` field alone decides, and the all-null struct
  * from an unmatched left-outer row loses to any real match (null orders
  * first).
  *
  * Scale: the join fans out spine × snapshots-per-key, which is bounded
  * by the snapshot retention (e.g. 30 daily snapshots), NOT by table
  * size — a small constant blow-up reduced right back map-side.
  * DuckDB's native ASOF JOIN is the oracle.
  */
object AsOfLookup {

  /** Default per-array cap for the multiplicity re-expansion. */
  val ExpandChunk: Long = 1L << 20

  /** Left as-of join: every spine row survives; feature columns are null
    * when no snapshot precedes the spine day (caller decides fill).
    * `snapshotDayAs` exposes which snapshot day matched.
    *
    * Because spine identity is the row's CONTENT, every spine column must
    * be groupable (no map types — reject upstream or stringify), and
    * grouping normalizes float keys the way any Spark groupBy does
    * (-0.0 ≡ 0.0, one NaN). Typical as-of spines (keys + day + scalar
    * payload) satisfy this trivially.
    */
  /** `maxStalenessDays`: when set, a snapshot older than the spine day by
    * more than this many days is no match — the feature-freshness guard
    * (serving stale features silently is worse than serving nulls a
    * caller can see and gate on). Bounding INSIDE the join condition also
    * prunes the fan-out to the tolerance window, so retention beyond the
    * tolerance costs nothing at lookup time. Equivalent to filtering the
    * unbounded argmax after the fact: the latest qualifying snapshot is
    * stale iff every one is.
    */
  def lookupAsOf(spine: DataFrame, snapshots: DataFrame, grainKeys: Seq[String],
      snapshotDayAs: String = "snapshot_day",
      expandChunk: Long = ExpandChunk,
      maxStalenessDays: Option[Int] = None): DataFrame = {
    maxStalenessDays.foreach(n =>
      require(n >= 0, s"lookupAsOf: maxStalenessDays must be >= 0, got $n"))
    require(!spine.columns.contains("__mult"),
      "lookupAsOf: spine already has a __mult column (reserved for the internal multiplicity)")
    require(expandChunk >= 1, s"lookupAsOf: expandChunk must be >= 1, got $expandChunk")
    val metricCols = snapshots.columns.toSeq.filterNot(grainKeys.contains)
      .filterNot(_ == "day")
    val f = snapshots.select(
      grainKeys.map(col) ++ (col("day").as(snapshotDayAs) +: metricCols.map(col)): _*)
    val spineCols = spine.columns.toSeq
    // Deterministic spine identity: collapse identical rows to one row +
    // multiplicity (groupBy treats nulls as equal, so null-keyed rows keep
    // their count too). Map-side combinable; duplicate-heavy spines also
    // pay less join fan-out.
    val sp = spine.groupBy(spineCols.map(col): _*)
      .agg(count(lit(1)).as("__mult")).alias("sp")
    val ff = f.alias("ff")
    // temporal predicate INSIDE the join condition so a spine row whose
    // snapshots are all in the future still survives (with nulls)
    val cond = grainKeys.map(k => col(s"sp.$k") === col(s"ff.$k")).reduce(_ && _) &&
      col(s"ff.$snapshotDayAs") <= col("sp.day") &&
      maxStalenessDays.map(n =>
        col(s"ff.$snapshotDayAs") >= date_sub(col("sp.day"), n))
        .getOrElse(lit(true))
    val payload = struct(
      col(s"ff.$snapshotDayAs").as(snapshotDayAs) +:
        metricCols.map(c => col(s"ff.$c").as(c)): _*)
    sp.join(ff, cond, "left_outer")
      .groupBy(spineCols.map(c => col(s"sp.$c")) :+ col("sp.__mult"): _*)
      .agg(max(payload).as("__best"))
      // restore multiplicity: one output row per original spine row. The
      // expansion is TWO-LEVEL so no single generated array ever exceeds
      // `expandChunk` elements — a flat explode(sequence(1, __mult)) would
      // materialize the entire multiplicity as one in-memory array inside
      // one task (and sequence() itself hard-fails near 2^31 elements), so
      // a degenerate spine of identical rows would OOM an executor instead
      // of degrading to many bounded batches.
      .withColumn("__chunk", explode(sequence(lit(0L),
        floor((col("__mult") - 1L) / expandChunk).cast("long"))))
      .withColumn("__i", explode(sequence(lit(1L),
        least(lit(expandChunk), col("__mult") - col("__chunk") * expandChunk))))
      .select(
        spineCols.map(col) ++
          (col(s"__best.$snapshotDayAs").as(snapshotDayAs) +:
            metricCols.map(c => col(s"__best.$c").as(c))): _*)
  }
}
