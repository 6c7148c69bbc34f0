package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ModelEval

/** Round-7 plan pins: ModelEval's cumulative statistics must be
  * range-partitioned (RangePrefix), never a single-task global window
  * over the data-derived distinct-score table.
  */
class Round7PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scored = (1L to 400L)
    .map(i => (i, i * 0.001, if (i % 3 == 0) 1 else 0))
    .toDF("id", "score", "purchased")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** The distinct-score cumulative pass must shuffle by RANGE; the only
    * sorts feeding a window may be within range partitions (a global
    * single-task sort would show as a SinglePartition exchange directly
    * under the window's sort).
    */
  private def assertRangePrefixed(p: String, what: String): Unit =
    PlanPins.assertRangePrefixed(p, what)

  test("auc: cumulative negatives are range-partitioned, not one task") {
    assertRangePrefixed(plan(ModelEval.auc(scored)), "ModelEval.auc")
  }

  test("liftTable: rank/grand totals are range-partitioned, not one task") {
    assertRangePrefixed(plan(ModelEval.liftTable(scored)),
      "ModelEval.liftTable")
  }

  test("groupedPrefixSums equals the naive per-group window, range-partitioned") {
    val rnd = new scala.util.Random(3)
    val df = (1L to 2000L).map(i =>
      // null group keys included: a null group is a group (module rule)
      (i, if (rnd.nextInt(4) == 0) null else s"g${rnd.nextInt(3)}",
        rnd.nextInt(50).toLong, rnd.nextInt(100).toLong))
      .toDF("id", "grp", "t", "w").repartition(11)
    val got = graft.ops.RangePrefix
      .groupedPrefixSums(df, Seq("grp"), Seq(col("t"), col("id")), Seq("w"))
      .select("id", "w_cum").as[(Long, Long)].collect().toMap
    val naive = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("t"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val exp = df.withColumn("c", sum(col("w")).over(naive))
      .select("id", "c").as[(Long, Long)].collect().toMap
    assert(got == exp)
    val p = graft.ops.RangePrefix
      .groupedPrefixSums(df, Seq("grp"), Seq(col("t"), col("id")), Seq("w"))
      .queryExecution.executedPlan.toString
    PlanPins.assertRangePrefixed(p, "groupedPrefixSums")
  }

  test("auc values match the naive single-window formula on random data") {
    // independent recomputation via the naive (single-task) window — the
    // exact value RangePrefix must reproduce regardless of partitioning
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s").asc)
    val perScore = scored.groupBy(col("score").as("s"))
      .agg(count(lit(1)).as("n"), sum(col("purchased").cast("long")).as("pos"))
      .withColumn("neg", col("n") - col("pos"))
    val naive = perScore
      .withColumn("neg_below", coalesce(sum(col("neg")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          -1)), lit(0L)))
      .agg((sum(col("pos").cast("decimal(38,0)") *
        (col("neg_below").cast("decimal(38,0)") * 2 +
          col("neg").cast("decimal(38,0)"))).cast("double") /
        (sum(col("pos")).cast("double") * sum(col("neg")).cast("double") * 2.0))
        .as("auc"))
      .head().getDouble(0)
    val got = ModelEval.auc(scored).head().getDouble(0)
    assert(math.abs(got - math.rint(naive * 1e9) / 1e9) < 1e-12,
      s"auc $got != naive $naive")
  }
}
