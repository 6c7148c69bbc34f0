package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Accuracy + mergeability contract of the HLL sketch distinct path
  * (sketch_distinct_merge): two-level merge (daily partials → union)
  * must agree with the direct sketch, and the estimate must track the
  * exact count within the sketch's error envelope.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("daily-partial union tracks exact counts; rel_err column is honest") {
    val rows = graft.SparkEntry.queries("sketch_distinct_merge")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_households")
      val exact = r.getAs[Long]("exact_households")
      val relErr = r.getAs[Double]("rel_err")
      // default lgK=12 HLL: well under 5% at any cardinality, exact at
      // the fixture's small per-commodity cardinalities
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
      assert(relErr == BigDecimal(math.abs(approx - exact).toDouble / exact)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("two-level merge == direct sketch (mergeability)") {
    val df = Seq((1L, 1, 10L), (1L, 1, 11L), (1L, 2, 10L), (2L, 1, 12L),
      (2L, 2, 13L), (2L, 2, 14L)).toDF("g", "day", "k")
    val direct = df.groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("k"))).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = df.groupBy("g", "day").agg(hll_sketch_agg(col("k")).as("sk"))
      .groupBy("g")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct == merged)
  }
}
