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

  test("quantile sketch: interpolation exact on a uniform histogram") {
    import graft.ops.QuantileSketch
    // 0..99 over 10 bins of width 10: p50 position 49.5 → bin 4,
    // est = 40 + 10·(49.5−40)/10 = 49.5 = quantile_cont's answer
    val df = (0 until 100).map(i => ("g", i % 7 + 1, i.toDouble))
      .toDF("g", "day", "v")
    val partials = QuantileSketch.dailyPartials(df, Seq("g"), "day", "v", 10.0)
    val q = QuantileSketch.quantiles(partials, Seq("g"), 10.0,
      Seq("p50" -> 0.5, "p0" -> 0.0, "p100" -> 1.0)).head()
    assert(q.getAs[Long]("n") == 100L)
    assert(q.getAs[Double]("p50") == 49.5)
    assert(q.getAs[Double]("p0") == 0.0)
    // p100: position 99 → last bin, est = 90 + 10·(99−90)/10 = 99
    assert(q.getAs[Double]("p100") == 99.0)
  }

  test("quantile sketch: merged partials track exact percentiles within binWidth") {
    import graft.ops.QuantileSketch
    val rnd = new scala.util.Random(5)
    val w = 2.5
    val rows = (1 to 5000).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      (g, rnd.nextInt(30) + 1, math.abs(rnd.nextGaussian()) * 20.0)
    }
    val df = rows.toDF("g", "day", "v").repartition(6)
    val partials = QuantileSketch.dailyPartials(df, Seq("g"), "day", "v", w)
    // partials stay tiny: ≤ groups × days × occupied bins
    assert(partials.count() <= 3L * 30L *
      (rows.map(_._3).max / w).toLong + 3L * 30L)
    val est = QuantileSketch.quantiles(partials, Seq("g"), w,
      Seq("p50" -> 0.5, "p95" -> 0.95))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    val exact = graft.ops.ExactPercentiles.perGroup(df, Seq("g"), "v",
      Seq("p50" -> 0.5, "p95" -> 0.95))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    exact.foreach { case (g, (e50, e95)) =>
      assert(math.abs(est(g)._1 - e50) <= w, s"$g p50 ${est(g)._1} vs $e50")
      assert(math.abs(est(g)._2 - e95) <= w, s"$g p95 ${est(g)._2} vs $e95")
    }
    // day-sliced partials merged == one-shot histogram over all data
    val oneShot = QuantileSketch.quantiles(
      QuantileSketch.dailyPartials(
        df.withColumn("day", lit(1)), Seq("g"), "day", "v", w),
      Seq("g"), w, Seq("p50" -> 0.5, "p95" -> 0.95))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    assert(oneShot == est)
  }

  test("top-k sketch: bounds always contain the exact count; every-day items exact") {
    import graft.ops.TopKSketch
    val rnd = new scala.util.Random(23)
    // skewed item stream over 10 days: item i has weight ∝ 1/(i+1)
    val rows = (1 to 6000).map { _ =>
      val item = (math.pow(rnd.nextDouble(), 2.5) * 40).toInt.toLong
      (rnd.nextInt(10) + 1, item)
    }
    val df = rows.toDF("day", "item_id").repartition(5)
    val partials = TopKSketch.dailyTopM(df, "day", "item_id", m = 6)
    // partials bounded: ≤ m rows per day
    assert(partials.count() <= 60L)
    val merged = TopKSketch.mergeTopK(partials, "day", k = 5).collect()
    assert(merged.length == 5)
    val exact = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    merged.foreach { r =>
      val (item, lb, ub, exactFlag) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4))
      assert(exact(item) >= lb && exact(item) <= ub,
        s"item $item exact ${exact(item)} outside [$lb, $ub]")
      if (exactFlag) assert(lb == ub && lb == exact(item),
        s"item $item flagged exact but lb=$lb ub=$ub true=${exact(item)}")
    }
    // the heaviest true item (in every day's top-m by construction)
    // must surface with an exact count
    val top = exact.maxBy(_._2)._1
    val topRow = merged.find(_.getLong(0) == top)
    assert(topRow.exists(_.getBoolean(4)), s"heaviest item $top not exact")
  }

  test("top-k sketch: day with fewer items than m is lossless (thresh 0)") {
    import graft.ops.TopKSketch
    val df = Seq((1, 10L), (1, 10L), (1, 11L)).toDF("day", "item_id")
    val p = TopKSketch.dailyTopM(df, "day", "item_id", m = 5).collect()
    assert(p.forall(_.getAs[Long]("thresh") == 0L))
    val m = TopKSketch.mergeTopK(
      TopKSketch.dailyTopM(df, "day", "item_id", m = 5), "day", k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(10L) == ((2L, 2L)) && m(11L) == ((1L, 1L)))
  }
}
