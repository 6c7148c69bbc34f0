package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Regression guard for the round-7 RangePrefix correctness fix: with the
  * bucketed silver enabled, theil_sen's slopes frame (an AQE-planned
  * self-join of a grouped aggregate) made the TWO consumptions of the
  * range exchange execute independently — self-join attribute dedup
  * defeats exchange reuse, and RangePartitioner's sampled bounds are
  * row-order-sensitive, so the offsets branch and the windowed branch
  * disagreed on pid assignment and 32% of the medians went wrong (NULLs
  * included). RangePrefix now pins ONE materialized execution
  * (pinnedRangePartition); this spec replays the exact triggering shape
  * against the naive single-task window.
  */
class RangePrefixRegressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("grouped percentiles on the silver-derived slopes frame are exact") {
    val was = graft.core.SilverStore.isEnabled
    graft.core.SilverStore.enable()
    try {
      val dir = "/root/testdata/sf0.01"
      val (lo, _) = graft.core.Retail.dayBounds(spark, dir)
      val weekly = graft.features.FeatureBuilder.txWithCommodity(spark, dir)
        .withColumn("week_idx",
          expr(s"datediff(day, DATE '${lo}') div 7").cast("long"))
        .groupBy(col("commodity_desc"), col("week_idx"))
        .agg(sum(col("amount_paid").cast("decimal(18,4)"))
          .cast("double").as("y"))
      val a = weekly.select(col("commodity_desc"),
        col("week_idx").as("w1"), col("y").as("y1"))
      val b = weekly.select(col("commodity_desc"),
        col("week_idx").as("w2"), col("y").as("y2"))
      val slopes = a.join(b, Seq("commodity_desc"))
        .filter(col("w2") > col("w1"))
        .select(col("commodity_desc"),
          round((col("y2") - col("y1"))
            / (col("w2") - col("w1")).cast("double"), 9).as("slope"))
      val got = graft.ops.ExactPercentiles.perGroup(slopes,
        Seq("commodity_desc"), "slope", Seq("m" -> 0.5))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val byVal = Window.partitionBy("commodity_desc").orderBy(col("__v"))
      val whole = Window.partitionBy("commodity_desc")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ranked = slopes.select(col("commodity_desc"),
          col("slope").cast("double").as("__v"))
        .withColumn("__rn", row_number().over(byVal).cast("long") - 1L)
        .withColumn("__n", count(lit(1)).over(whole))
      val pos = (col("__n") - 1L).cast("double") * lit(0.5)
      val exp = ranked.groupBy("commodity_desc").agg(
        max(when(col("__rn") === floor(pos).cast("long"), col("__v"))).as("lo"),
        max(when(col("__rn") === ceil(pos).cast("long"), col("__v"))).as("hi"),
        max(col("__n")).as("n"))
        .select(col("commodity_desc"),
          (col("lo") + (col("hi") - col("lo")) *
            (((col("n") - 1L).cast("double") * lit(0.5)) -
              floor((col("n") - 1L).cast("double") * lit(0.5)))).as("m"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val diff = exp.keys.filter(k => got.get(k) != exp.get(k))
      assert(diff.isEmpty,
        s"mismatched medians: ${diff.take(5).map(k => (k, got.get(k), exp.get(k)))}")
    } finally if (!was) graft.core.SilverStore.disable()
  }
}
