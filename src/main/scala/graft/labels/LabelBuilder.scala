package graft.labels

import java.time.LocalDate
import java.sql.Date
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Label construction (`04b_Task__Model_Training.py:106-186`).
  *
  * Given a feature cutoff `featuresEndDay` (= current − 30,
  * `04b:89-95`), a household is labeled 1 for a commodity iff it purchased
  * that commodity in the NEXT horizon days. The universe is every
  * (household × scored commodity) pair — a cross join (J4) where the
  * commodity side is ~10 rows, so Spark plans a broadcast nested loop with
  * no shuffle; positives then LEFT-join on (SURVEY.md J3) and
  * `coalesce(purchased, 0)` (P9) fills the negatives. Rows are stamped
  * with the cutoff day (P10) so the feature lookup hits the exact PK day.
  */
object LabelBuilder {

  val horizonDays: Int = 30

  /** (universeSpine, labels) for one cutoff. `txc` = silver fact with
    * commodity_desc; `commodities` = the to-score control table.
    */
  /* Note: the household universe derives from `txc` (fact ⋈ products),
   * while the reference's derives from the raw fact (`04b:141`) — these
   * agree whenever every transacted product exists in the dim (true of
   * the fixture, and of any referentially-intact catalog); a household
   * whose ONLY purchases reference unknown products would be absent here.
   */
  def labels(txc: DataFrame, commodities: DataFrame, featuresEndDay: LocalDate): DataFrame = {
    val fed = Date.valueOf(featuresEndDay)
    val horizonEnd = Date.valueOf(featuresEndDay.plusDays(horizonDays))
    // The control table feeds both the universe and the positives filter.
    // It is ≤ k rows by construction (a top-k control table — the
    // reference collects it too, 02:45-47), so pin it driver-side as a
    // local relation: the top-k aggregation runs exactly once and nothing
    // is left cached behind the caller's back.
    val spark = txc.sparkSession
    import spark.implicits._
    val cts = commodities.select("commodity_desc")
      .collect().map(_.getString(0)).toSeq.toDF("commodity_desc")
    val households = txc.select("household_key").distinct()
    val universe = households.crossJoin(broadcast(cts))
    val positives = txc
      .filter(col("day") > lit(fed) && col("day") <= lit(horizonEnd))
      .join(broadcast(cts), Seq("commodity_desc"), "left_semi")
      .select("household_key", "commodity_desc").distinct()
      .withColumn("purchased", lit(1))
    universe
      .join(positives, Seq("household_key", "commodity_desc"), "left_outer")
      .select(
        col("household_key"), col("commodity_desc"),
        lit(fed).as("day"),
        coalesce(col("purchased"), lit(0)).as("purchased"))
  }

  /** W1: per-commodity positive-class ratio via a partitioned window sum
    * (`04b:174-182`) — the reference's only window-function use.
    */
  def posRatio(labels: DataFrame): DataFrame = {
    val byCommodity = Window.partitionBy(col("commodity_desc"))
    labels
      .groupBy("commodity_desc", "purchased")
      .agg(count(lit(1)).as("class_rows"))
      .withColumn("commodity_rows", sum(col("class_rows")).over(byCommodity))
      .withColumn("class_ratio",
        col("class_rows").cast("double") / col("commodity_rows").cast("double"))
  }
}
