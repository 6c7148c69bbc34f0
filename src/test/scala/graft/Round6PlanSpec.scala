package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Impute, QuantileNormalize, Rendezvous, SkewJoin}

/** Plan pins for the round-6 operators: the properties that make them
  * scale must be visible in the physical plan.
  */
class Round6PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("salted join: build side replicated via explode, salt in join keys") {
    val probe = Seq((1, 1.0), (2, 2.0)).toDF("k", "v")
    val build = Seq((1, "a"), (2, "b")).toDF("k", "name")
    val p = plan(SkewJoin.saltedInner(probe, build, Seq("k"), salt = 8))
    assert(p.toLowerCase.contains("explode"),
      s"build side must replicate via explode:\n$p")
    assert(p.contains("__salt"), s"join must key on the salt:\n$p")
  }

  test("quantile normalize: global rank is range-partitioned, not one task") {
    val df = (1L to 500L).map(i => (i, if (i % 2 == 0) "a" else "b", i * 0.5))
      .toDF("id", "grp", "v")
    val p = plan(QuantileNormalize.perGroup(df, Seq("grp"), "v", "id"))
    PlanPins.assertRangePrefixed(p, "QuantileNormalize global rank")
  }

  test("impute: group statistics broadcast back onto the fact") {
    val df = Seq((1L, "a", Some(1.0), Some("x")),
      (2L, "a", None, None)).toDF("id", "grp", "num", "cat")
    val p = plan(Impute.meanMode(df, Seq("grp"), "num", "cat"))
    assert(p.contains("BroadcastHashJoin"),
      s"mean/mode frames must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no data-sized shuffle join for tiny stats frames:\n$p")
  }

  test("rendezvous assignment is shuffle-free per-row algebra") {
    val df = (1L to 100L).toDF("k")
    val p = plan(df.select(
      Rendezvous.assign(col("k"), Seq("w0", "w1", "w2")).as("w")))
    assert(!p.contains("Exchange"), s"assignment must not shuffle:\n$p")
    assert(!p.toLowerCase.contains("join"), s"no join in assignment:\n$p")
  }
}
