package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.WeightedSample

class WeightedSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two groups x 2000 keys; weights 1..100 cycling
  private lazy val df = (0L until 4000L)
    .map(i => (i, if (i % 2 == 0) "a" else "b", (i % 100) + 1))
    .toDF("k", "g", "w")

  test("exactly k rows per group, ranks contiguous") {
    val out = WeightedSample.topKPerGroup(df, Seq("g"), "k", "w", 25)
    val byG = out.groupBy("g").agg(count(lit(1)).as("n"),
      max("sample_rank").as("mx"), min("sample_rank").as("mn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(byG.toSet == Set(("a", 25L, 25L, 1L), ("b", 25L, 25L, 1L)))
  }

  test("selection is weight-biased: sampled mean weight >> population mean") {
    val out = WeightedSample.topKPerGroup(df, Seq("g"), "k", "w", 50)
    val sampled = out.agg(avg("w")).as[Double].head()
    val popMean = df.agg(avg("w")).as[Double].head() // 50.5
    assert(sampled > popMean * 1.2,
      s"sampled mean $sampled should exceed population mean $popMean")
  }

  test("deterministic under repartitioning and row order") {
    val a = WeightedSample.topKPerGroup(df, Seq("g"), "k", "w", 25)
      .select("k").as[Long].collect().sorted.toSeq
    val b = WeightedSample.topKPerGroup(
        df.repartition(13, col("w")).sortWithinPartitions(desc("k")),
        Seq("g"), "k", "w", 25)
      .select("k").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("non-positive and null weights are dropped") {
    val bad = Seq((1L, "a", Some(0L)), (2L, "a", Some(-5L)),
      (3L, "a", Option.empty[Long]), (4L, "a", Some(10L)))
      .toDF("k", "g", "w")
    val out = WeightedSample.topKPerGroup(bad, Seq("g"), "k", "w", 10)
      .select("k").as[Long].collect()
    assert(out.toSeq == Seq(4L))
  }

  test("rank filter pushes into WindowGroupLimit (map-side top-k)") {
    val plan = WeightedSample.topKPerGroup(df, Seq("g"), "k", "w", 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }
}
