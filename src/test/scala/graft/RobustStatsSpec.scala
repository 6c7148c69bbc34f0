package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Sanity pins for the closing analytics wave (the full definitions are
  * oracle-proven; these pin the statistical invariants).
  */
class RobustStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("gini is in [0, 1) and equals 0 for a uniform distribution") {
    val rows = graft.QueryRegistry.queries("spend_gini")(spark, sf)
      .select("gini").as[Double].collect()
    assert(rows.nonEmpty && rows.forall(g => g >= 0.0 && g < 1.0))
    // uniform synthetic check through the same identity
    import org.apache.spark.sql.expressions.Window
    val uni = Seq.tabulate(10)(i => ("c", i.toLong, 5.0))
      .toDF("g", "k", "v")
      .groupBy("g", "k")
      .agg(sum(col("v").cast("decimal(18,4)")).cast("decimal(18,4)").as("x"))
    val w = Window.partitionBy("g").orderBy(col("x"), col("k"))
    val gini = uni.withColumn("i", row_number().over(w).cast("long"))
      .groupBy("g").agg(
        round((lit(2.0) * sum(col("x") * col("i")).cast("double")
          - (count(lit(1)) + lit(1L)).cast("double")
            * sum(col("x")).cast("double"))
          / (count(lit(1)).cast("double") * sum(col("x")).cast("double")),
          9).as("gini"))
      .select("gini").as[Double].head()
    assert(gini == 0.0)
  }

  test("theil-sen recovers the exact slope of a clean linear series") {
    // y = 3x + noise-free → every pairwise slope is 3
    import org.apache.spark.sql.expressions.Window
    val weekly = (0L to 20L).map(w => ("c", w, 3.0 * w)).toDF("g", "w", "y")
    val a = weekly.select(col("g"), col("w").as("w1"), col("y").as("y1"))
    val b = weekly.select(col("g"), col("w").as("w2"), col("y").as("y2"))
    val slopes = a.join(b, Seq("g")).filter(col("w2") > col("w1"))
      .select(col("g"), round((col("y2") - col("y1"))
        / (col("w2") - col("w1")).cast("double"), 9).as("slope"))
    val med = graft.ops.ExactPercentiles.perGroup(slopes, Seq("g"),
      "slope", Seq("m" -> 0.5)).select("m").as[Double].head()
    assert(med == 3.0)
  }

  test("benford observed shares sum to ~1 and digits cover 1-9 only") {
    val rows = graft.QueryRegistry.queries("benford_audit")(spark, sf)
      .select("digit", "observed_share").as[(Long, Double)].collect()
    assert(rows.map(_._1).toSet.subsetOf((1L to 9L).toSet))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-6)
  }
}
