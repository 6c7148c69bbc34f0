package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join without an equi-key — the classic
  * operator Spark's optimizer has no native strategy for: a plain
  * `points.join(intervals, start <= p && p <= end)` plans as a broadcast
  * nested-loop (all pairs), which is quadratic the moment both sides are
  * data-sized.
  *
  * Engine shape (the standard bucketization rewrite, composed from
  * built-ins per the preference order in SURVEY.md §4): pick a bucket
  * width `W` on the join axis; each interval explodes into the buckets it
  * overlaps (`ceil(len/W) + 1` rows — bounded by interval length, not
  * table size); each point maps to exactly one bucket; hash-join on the
  * bucket id; re-check the exact containment predicate inside the join.
  * Cost: one shuffle of each side on the bucket id + linear refine — no
  * cross product anywhere in the plan.
  *
  * Choosing `W`: ~ the typical interval length. Much smaller → interval
  * side explodes by len/W; much larger → each bucket pairs points with
  * intervals that cannot match (refine discards them, but they were
  * shuffled and compared). Extremely skewed axes (all activity in one
  * bucket) degrade to the dense bucket — AQE's skew-join split handles
  * the join stage; re-bucketing with a smaller W is the structural fix.
  *
  * (The reference has no range join — its PIT lookup is exact-match by
  * design, `04a:599`; the true as-of case is [[graft.train.AsOfLookup]].
  * This operator covers the remaining temporal-join family: attribution
  * windows, promo/campaign periods, sensor validity intervals.)
  */
object RangeJoin {

  /** Floor-division bucket id — exact long arithmetic at any epoch
    * magnitude (a double `floor(x / w)` would lose integer precision
    * above 2^53, mis-bucketing points near bucket boundaries), correct
    * for negative axis values too (`div` alone truncates toward zero).
    */
  private def bucketOf(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / lit(w)).cast("long")

  /** Join each point row to every interval row whose
    * `[startCol, endCol]` (inclusive) contains `pointCol`. Point and
    * interval columns must be disjoint; the join axis must be integral
    * (epoch seconds/micros, day numbers — convert timestamps upstream).
    * Intervals with `end < start` match nothing (dropped by the
    * bucket-range generation, same as they would be by the predicate).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0,
      s"RangeJoin.pointInInterval: bucketWidth must be positive, got $bucketWidth")
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty,
      s"RangeJoin.pointInInterval: point/interval columns must be disjoint, both have ${overlap.mkString(", ")}")
    require(!points.columns.contains("__rjb") && !intervals.columns.contains("__rjb"),
      "RangeJoin.pointInInterval: __rjb is reserved")
    val pts = points.withColumn("__rjb", bucketOf(col(pointCol), bucketWidth))
    val ivs = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__rjb", explode(sequence(
        bucketOf(col(startCol), bucketWidth),
        bucketOf(col(endCol), bucketWidth))))
    pts.join(ivs, Seq("__rjb"))
      .filter(col(startCol) <= col(pointCol) && col(pointCol) <= col(endCol))
      .drop("__rjb")
  }
}
