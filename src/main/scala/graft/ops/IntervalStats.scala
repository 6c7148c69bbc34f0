package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe aggregates of points over time windows — the rewrite that
  * removes the density-quadratic pair join from interval-containment
  * ANALYTICS (counts/sums per window), keeping the pair join only where
  * set semantics genuinely require it (per-window DISTINCT).
  *
  * Measured motivation (BENCH_NOTES round 7, events×50 study): the
  * bucketized pair join behind `interval_join_errors` did work
  * proportional to |windows| × points-per-window — 0.86s → 197.6s (229×)
  * for 50× data, because replicating users multiplies temporal DENSITY
  * and containment pair counts grow quadratically in it. But three of
  * its four aggregates are SUBTRACTIVE: for additive weight w,
  *
  *   Σ_{p ∈ [s, e]} w(p) = F(e) − F(s−1),  F = global prefix sum over ep
  *
  * so [[prefixDiff]] computes them with ONE [[RangePrefix]] pass over
  * points ∪ boundary probes (zero-weight rows injected at s−1 and e;
  * ties order points BEFORE probes so both bounds are inclusive-exact)
  * — linear in |points| + |windows|, no pair ever materialized, and
  * decimal weights stay exact through the prefix (addition is
  * order-free), so results are bit-identical to the pair-join form.
  *
  * [[distinctInWindows]] handles the non-subtractive aggregate
  * (COUNT DISTINCT key per window, fixed window span): a key counts in
  * window [s, s+span] iff it has an event there — equivalently iff its
  * FIRST in-window event has no same-key predecessor at ≥ s. Each event
  * therefore covers the start-interval
  *
  *   [max(prev_ep + 1, ep − span), ep]
  *
  * (prev_ep = the key's previous distinct event time), and the per-window
  * distinct count is a point-in-interval join of window STARTS against
  * these coverage intervals — pair work = Σ_w distinct-keys(w), the
  * OUTPUT size, instead of Σ_w events(w): bursty keys collapse their
  * events into short coverage intervals, so the join shrinks by exactly
  * the per-window duplication factor the pair join wasted.
  */
object IntervalStats {

  /** For each window `[startCol, endCol]` (inclusive, integral axis),
    * the sums of `weightCols` over contained points.
    * `points` must carry `epCol`, a unique `idCol` (tie-break for the
    * total prefix order), and the numeric weight columns (derive
    * indicator weights upstream: `when(cond, 1L).otherwise(0L)`).
    * Returns one row per window: windowIdCol ++ `<w>_in_window`.
    * Windows containing no points report exact zeros.
    */
  def prefixDiff(points: DataFrame, epCol: String, idCol: String,
      weightCols: Seq[String], windows: DataFrame, windowIdCol: String,
      startCol: String, endCol: String): DataFrame = {
    require(weightCols.nonEmpty, "IntervalStats.prefixDiff: need weights")
    // probes ride with ZERO weight (a typed zero, NOT null: a range
    // partition holding only probes would make a null weight's local
    // running sum null and poison the cum) at kind 0 → s−1, kind 1 → e
    val zeros = weightCols.map(w =>
      lit(0).cast(points.schema(w).dataType).as(w))
    def probe(at: Column, kind: Int) = windows.select(
      Seq(at.as("__ep"), lit(1).as("__isprobe"),
        concat(col(windowIdCol).cast("string"), lit(s"#$kind")).as("__tie"),
        col(windowIdCol).as("__wid"), lit(kind).as("__kind")) ++ zeros: _*)
    val pts = points.select(
      Seq(col(epCol).as("__ep"), lit(0).as("__isprobe"),
        col(idCol).cast("string").as("__tie"),
        lit(null).cast(windows.schema(windowIdCol).dataType).as("__wid"),
        lit(null).cast("int").as("__kind")) ++ weightCols.map(col): _*)
    val unified = pts
      .unionByName(probe(col(startCol) - 1, 0))
      .unionByName(probe(col(endCol), 1))
    // points sort BEFORE probes at equal ep (__isprobe 0 < 1): a probe at
    // t accumulates every point with ep <= t — the inclusive bound
    val cum = RangePrefix.prefixSums(unified,
      Seq(col("__ep"), col("__isprobe"), col("__tie")), weightCols)
    val diffs = weightCols.flatMap { w =>
      Seq(
        max(when(col("__kind") === 1, col(s"${w}_cum"))).as(s"__e_$w"),
        max(when(col("__kind") === 0, col(s"${w}_cum"))).as(s"__s_$w"))
    }
    cum.filter(col("__isprobe") === 1)
      .groupBy(col("__wid").as(windowIdCol))
      .agg(diffs.head, diffs.tail: _*)
      .select(col(windowIdCol) +: weightCols.map(w =>
        (col(s"__e_$w") - col(s"__s_$w")).as(s"${w}_in_window")): _*)
  }

  /** For each window `[startCol, startCol + span]` (inclusive), the
    * number of DISTINCT `keyCol` values among contained points, via the
    * coverage-interval join (scaladoc above). NULL keys are excluded,
    * matching SQL COUNT(DISTINCT key) — without the filter a window
    * whose only events carry a null key would report 1 (the null's
    * coverage row survives `.distinct()` and is counted by
    * `count(lit(1))`). Output: windowIdCol, n_distinct. Windows covering no key report no row (callers'
    * windows are usually anchored on a contained point; left-join and
    * fill 0 otherwise).
    */
  def distinctInWindows(points: DataFrame, epCol: String, keyCol: String,
      windows: DataFrame, windowIdCol: String, startCol: String,
      span: Long, bucketWidth: Long = 0L): DataFrame = {
    require(span >= 0, s"IntervalStats.distinctInWindows: span >= 0, got $span")
    val w = if (bucketWidth > 0) bucketWidth else math.max(1L, span)
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__p"))
    val coverage = points
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"), col(epCol).as("__p")).distinct()
      .withColumn("__prev", lag(col("__p"), 1).over(byKey))
      .select(col("__k"),
        greatest(coalesce(col("__prev") + 1, col("__p") - span),
          col("__p") - span).as("__lo"),
        col("__p").as("__hi"))
    val starts = windows.select(col(windowIdCol).as("__wid"),
      col(startCol).as("__s"))
    RangeJoin.pointInInterval(starts, coverage, "__s", "__lo", "__hi", w)
      .groupBy(col("__wid").as(windowIdCol))
      .agg(count(lit(1)).as("n_distinct"))
  }
}
