package graft.pipeline

import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Retail
import graft.features.{FeatureBuilder, FeatureTable}
import graft.labels.LabelBuilder
import graft.ops.Commodities
import graft.score.{MergeWriter, Scorer}
import graft.silver.TransactionsAdj
import graft.train.{ModelStore, PropensityTrainer, TrainingSetBuilder}

/** Orchestration of the reference's workflow DAG (`RUNME.py:66-170`,
  * `03_Define_Workflow.py:13`): notebooks-as-tasks become plain Scala
  * functions over (SparkSession, Config) — Init (feature backfill at
  * {cur, cur−30}, `02:78-88`), Weekly (train per commodity), Daily
  * (feature refresh → score → merge). State lives in keyed FeatureTables
  * + the ModelStore under `workRoot`.
  */
final case class PipelineConfig(
    sfDir: String,
    workRoot: String,
    nCommodities: Int = 10,
    trainer: PropensityTrainer.Config = PropensityTrainer.Config())

final class PropensityPipeline(spark: SparkSession, cfg: PipelineConfig) {

  private def ft(name: String, keys: Seq[String]) =
    FeatureTable(s"${cfg.workRoot}/$name", keys :+ "day")

  val householdFeatures: FeatureTable = ft("household_features", Seq("household_key"))
  val commodityFeatures: FeatureTable = ft("commodity_features", Seq("commodity_desc"))
  val householdCommodityFeatures: FeatureTable =
    ft("household_commodity_features", Seq("household_key", "commodity_desc"))
  val pivoted: FeatureTable =
    FeatureTable(s"${cfg.workRoot}/propensities_pivoted", Seq("household_key", "day"))
  val models: ModelStore = ModelStore(s"${cfg.workRoot}/models")

  def tx: DataFrame = TransactionsAdj(spark, cfg.sfDir)
  def txc: DataFrame = FeatureBuilder.txWithCommodity(spark, cfg.sfDir)
  def commodities: DataFrame =
    Commodities.commoditiesToScore(spark, cfg.sfDir, cfg.nCommodities).cache()

  def currentDay: LocalDate = FeatureBuilder.bounds(tx)._2

  /** Feature snapshot for every grain as-of `day` (history ≤ day only),
    * upserted into the keyed tables (S8).
    */
  def computeFeatures(day: LocalDate): Unit = {
    val d = java.sql.Date.valueOf(day)
    val txAsOf = tx.filter(col("day") <= lit(d))
    val txcAsOf = txc.filter(col("day") <= lit(d))
    def stamped(df: DataFrame) = df.withColumn("day", lit(d))
    householdFeatures.upsert(spark,
      stamped(FeatureBuilder.build(txAsOf, FeatureBuilder.household)))
    commodityFeatures.upsert(spark,
      stamped(FeatureBuilder.build(txcAsOf, FeatureBuilder.commodity)))
    householdCommodityFeatures.upsert(spark,
      stamped(FeatureBuilder.build(txcAsOf, FeatureBuilder.householdCommodity)))
  }

  /** Init (`02_Initialize_Solution.py:78-88`): backfill features at the
    * label cutoff and at current, so training lookups hit exact PK days.
    */
  def init(): Unit = {
    val cur = currentDay
    computeFeatures(cur.minusDays(LabelBuilder.horizonDays))
    computeFeatures(cur)
  }

  private def lookups = Seq(
    TrainingSetBuilder.Lookup(householdFeatures.read(spark),
      Seq("household_key"), "household__"),
    TrainingSetBuilder.Lookup(commodityFeatures.read(spark),
      Seq("commodity_desc"), "commodity__"),
    TrainingSetBuilder.Lookup(householdCommodityFeatures.read(spark),
      Seq("household_key", "commodity_desc"), "household_commodity__"))

  /** Weekly (`04b`): labels at cur−30, PIT-join features, one model per
    * commodity, promoted to Production.
    */
  def trainAll(): Seq[(String, Double)] = {
    val cur = currentDay
    val fed = cur.minusDays(LabelBuilder.horizonDays)
    val labels = LabelBuilder.labels(txc, commodities, fed).cache()
    val trainingSet = TrainingSetBuilder.build(labels, lookups).cache()
    val featureCols = trainingSet.columns.toSeq.filter(c => c.contains("__"))
    val cs = commodities.select("commodity_desc", "commodity_clean")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val ratios = LabelBuilder.posRatio(labels)
      .filter(col("purchased") === 1)
      .select("commodity_desc", "class_ratio")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    cs.map { case (desc, clean) =>
      val slice = trainingSet.filter(col("commodity_desc") === desc)
      val weighted = PropensityTrainer.withWeights(slice, ratios.getOrElse(desc, 0.5))
      val (trainDf, _, test) = PropensityTrainer.split(weighted, cfg.trainer.seed)
      val model = PropensityTrainer.train(trainDf, featureCols, cfg.trainer)
      val auprc = PropensityTrainer.evaluate(model, test)
      val v = models.save(clean, model)
      models.promote(clean, v)
      (desc, auprc)
    }
  }

  /** Daily (`04c`): score every (household, commodity) on current features,
    * merge pivoted (S7) + append unpivoted (S6).
    */
  def scoreAll(): DataFrame = {
    val cur = currentDay
    val d = java.sql.Date.valueOf(cur)
    val spine0 = tx.select("household_key").distinct()
      .crossJoin(broadcast(commodities.select("commodity_desc", "commodity_clean")))
      .withColumn("day", lit(d))
    val spine = TrainingSetBuilder.build(
      spine0, lookups).cache()
    val cs = commodities.select("commodity_desc", "commodity_clean")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val scored = cs.map { case (desc, clean) =>
      val slice = spine.filter(col("commodity_desc") === desc)
      val model = models.loadProduction(clean)
      val s = Scorer.score(model, slice)
      MergeWriter.mergeColumn(spark, pivoted, s, clean)
      s
    }
    val unpivoted = scored.reduce(_.unionByName(_))
    unpivoted.write.mode("append")
      .parquet(s"${cfg.workRoot}/propensities_unpivoted")
    unpivoted
  }
}
