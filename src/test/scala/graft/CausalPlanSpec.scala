package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Causal, Drift, Screen, ShapleyAttribution}

/** Plan pins for the causal/stats wave: the properties that make each
  * estimator scale must be visible in the physical plan.
  */
class CausalPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("exact KS: prefix sums range-partition; offsets broadcast back") {
    val rows = (1 to 400).map(i => (i * 0.5, i % 3 == 0))
    val p = plan(Drift.exactKs(rows.toDF("value", "is_a"), "value",
      col("is_a")))
    PlanPins.assertRangePrefixed(p, "Drift.exactKs")
    assert(p.contains("BroadcastHashJoin"),
      s"per-partition offsets must broadcast onto the value table:\n$p")
  }

  test("matched ATT: windows partition by stratum, never SinglePartition") {
    val rows = (1L to 200L).map(i =>
      (i, s"s${i % 8}", (i % 3 == 0).compareTo(false), i * 1.0, i * 2.0))
    val p = plan(Causal.matchedAtt(
      rows.toDF("id", "stratum", "treated", "x", "y")))
    // every window spec must open with the stratum partition key — an
    // unpartitioned spec would collapse the match scan to one task (the
    // only SinglePartition allowed is the 8-row __all__ grand aggregate)
    val specs = "windowspecdefinition\\(\\w+".r.findAllIn(p).toSeq
    assert(specs.nonEmpty, s"prev/next scan is a window:\n$p")
    assert(specs.forall(_.contains("windowspecdefinition(stratum")),
      s"matching windows must partition by stratum (blocks):\n$specs")
  }

  test("ipw: one hash-aggregate pass over units, no data-sized join") {
    val rows = (1L to 200L).map(i =>
      (s"s${i % 4}", (i % 3 == 0).compareTo(false), i * 1.0))
    val p = plan(Causal.ipwStratified(rows.toDF("stratum", "treated", "y")))
    assert(p.contains("HashAggregate"), s"stratum agg is hash-based:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing data-sized may shuffle-join:\n$p")
  }

  test("shapley: coalition algebra joins broadcast, never shuffle") {
    val events = (1L to 300L).flatMap { u =>
      Seq((u * 2, new java.sql.Timestamp(1000L), u, "click"),
        (u * 2 + 1, new java.sql.Timestamp(2000L), u, "purchase"))
    }.toDF("event_id", "ts", "user_id", "event_type")
    val p = plan(ShapleyAttribution(events, Seq("click", "view")))
    assert(!p.contains("SortMergeJoin"),
      s"mask/coalition tables are control-sized — broadcast only:\n$p")
    assert(p.contains("HashAggregate"),
      s"the one data-sized pass is a hash aggregate:\n$p")
  }

  test("chi2 screen: pure aggregation — no join, no window") {
    val rows = (1 to 300).map(i => (s"f${i % 5}", i % 2, (i / 2) % 2))
    val p = plan(Screen.chi2(rows.toDF("feature", "f", "label")))
    assert(!p.toLowerCase.contains("join"), s"no join:\n$p")
    assert(!p.contains("Window"), s"no window:\n$p")
  }

  test("conformal: quantile range-partitions; means broadcast back") {
    val rows = (1 to 500).map { i =>
      val split = i % 10 match {
        case x if x < 6 => "train"; case x if x < 8 => "cal"
        case _ => "test"
      }
      (s"u$i", s"s${i % 3}", split, i * 1.0)
    }
    val p = plan(graft.ops.Conformal.splitConformal(
      rows.toDF("id", "stratum", "split", "y")))
    PlanPins.assertRangePrefixed(p, "Conformal.splitConformal")
    assert(p.contains("BroadcastHashJoin"),
      s"train means must broadcast onto cal/test:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing data-sized may shuffle-join:\n$p")
  }

  test("qini: deciles come from the range-partitioned ntile") {
    val rows = (1L to 400L).map(i => (i, (i % 2).toInt, i * 1.0,
      (i % 3 == 0).compareTo(false)))
    val p = plan(Causal.upliftQini(
      rows.toDF("id", "treated", "score", "converted")))
    PlanPins.assertRangePrefixed(p, "Causal.upliftQini deciles")
  }
}
