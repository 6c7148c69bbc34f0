package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (right-censored) — the
  * purchase-cycle / churn statistic the reference's fixed-30-day label
  * horizon flattens away (`04b_Task__Model_Training.py:122` stamps
  * purchased-within-window flags and discards WHEN within the window —
  * SURVEY.md §2.6): the statistic behind "how long until the customer
  * buys again", fed by the same inter-purchase gaps as
  * `repurchase_intervals` but answering the censoring-aware question
  * that a plain gap histogram gets wrong (households whose NEXT purchase
  * has not happened yet are evidence of long gaps, not missing data).
  *
  *   S(t) = Π_{tᵢ ≤ t} (1 − dᵢ / nᵢ)
  *
  * with dᵢ events and nᵢ at-risk at each distinct time tᵢ (censored
  * observations count in nᵢ at their time, then leave the risk set).
  *
  * Decomposition: [[curve]] is the data-sized pass — one hash aggregate
  * of observations to (group, time) with event/censor counts, then the
  * at-risk window (exclusive cumulative removals subtracted from the
  * group total) on the curve table, which is CURVE-POINT-sized
  * (|groups| × |distinct times|), not observation-sized. The product is
  * closed on the collected curve ([[kaplanMeier]] — the MarkovAttribution
  * control-table pattern): each factor (1 − d/n) is quantized HALF_UP to
  * 9 dp, each running product re-quantized — NO libm exp/ln anywhere, so
  * the fold is bit-identical in any engine following the same
  * quantization. The oracle replays it as a recursive CTE in DuckDB;
  * hash equality proves the whole estimator. An absorbing step
  * (d = n, factor 0) zeroes the curve from there automatically.
  */
object Survival {

  /** The product fold collects the CURVE table (|groups| × |distinct
    * times|) — curve-point-sized by construction, and this cap enforces
    * it (the [[graft.dedup.Clusters.driverPairLimit]] treatment): a
    * caller whose grouping makes the curve data-sized fails loudly
    * instead of OOMing the driver.
    */
  val driverRowLimit: Long = 2000000L

  /** Distributed curve table: groupCols, time, n_risk, d_events,
    * c_censored — `obs` must carry integer `timeCol` and 0/1 `eventCol`.
    */
  def curve(obs: DataFrame, groupCols: Seq[String], timeCol: String,
      eventCol: String): DataFrame = {
    val g = groupCols.map(col)
    val pt = obs.groupBy(g :+ col(timeCol).as("t"): _*).agg(
      sum(col(eventCol).cast("long")).as("d_events"),
      (count(lit(1)) - sum(col(eventCol).cast("long"))).as("c_censored"))
    val byGroup = Window.partitionBy(g: _*)
    val ordered = byGroup.orderBy(col("t"))
    pt.withColumn("__total",
        sum(col("d_events") + col("c_censored")).over(byGroup))
      .withColumn("__removed_before",
        coalesce(sum(col("d_events") + col("c_censored"))
          .over(ordered.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("__total") - col("__removed_before"))
      .select(g ++ Seq(col("t"), col("n_risk"), col("d_events"),
        col("c_censored")): _*)
  }

  private def round9d(x: Double): JBigDecimal = Round9.round9d(x)

  /** Full estimator: [[curve]] + the exact quantized product fold,
    * returning (groupCols..., time, n_risk, d_events, c_censored,
    * survival). The collect is curve-point-sized by construction.
    */
  def kaplanMeier(obs: DataFrame, groupCols: Seq[String], timeCol: String,
      eventCol: String, driverLimit: Long = driverRowLimit): DataFrame = {
    val spark = obs.sparkSession
    val c = curve(obs, groupCols, timeCol, eventCol).cache()
    // probed cutover guard (the Clusters pattern): detect an oversized
    // curve without materializing it; the legal path reuses the cache
    val probed = c
      .limit(math.min(driverLimit + 1, Int.MaxValue.toLong).toInt).count()
    require(probed <= driverLimit,
      s"Survival.kaplanMeier: curve exceeds $driverLimit rows — group to " +
        "a coarser grain (the fold is for curve-point-sized tables)")
    val rows = try c.collect() finally { c.unpersist(); () }
    val n = groupCols.size
    val folded = rows
      .map { r =>
        (groupCols.indices.map(r.get).toSeq,
          (r.getAs[Number]("t").longValue(), r.getAs[Long]("n_risk"),
            r.getAs[Long]("d_events"), r.getAs[Long]("c_censored")))
      }
      .groupBy(_._1).toSeq
      .flatMap { case (key, grp) =>
        var s = JBigDecimal.ONE
        grp.map(_._2).sortBy(_._1).map { case (t, nr, d, cc) =>
          val factor = round9d(1.0 - d.toDouble / nr.toDouble)
          s = s.multiply(factor).setScale(9, RoundingMode.HALF_UP)
          org.apache.spark.sql.Row.fromSeq(
            key ++ Seq[Any](t, nr, d, cc, s.doubleValue()))
        }
      }
    val schema = org.apache.spark.sql.types.StructType(
      groupCols.map(c.schema(_)) ++ Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_risk",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("d_events",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("c_censored",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("survival",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(folded, 1), schema)
      .withColumnsRenamed(Map("t" -> timeCol))
  }
}
