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
    trainer: PropensityTrainer.Config = PipelineConfig.defaultTrainer)

object PipelineConfig {
  /** Default pipeline trainer: a modest 9-point GBT grid capped at depth
    * 12. `PropensityTrainer.Config()`'s own default is the REFERENCE
    * budget — a 50-eval random search reaching depth 20 (`04b:391-395`) —
    * which is a deliberate cluster-scale job (MLlib GBT has no histogram
    * binning; deep trees are disproportionately slow). A pipeline caller
    * relying on defaults should get a sane cost, not a silent 50-trial
    * sweep; the reference budget stays one explicit opt-in away:
    * `cfg.copy(trainer = PropensityTrainer.Config())`.
    */
  val defaultTrainer: PropensityTrainer.Config = PropensityTrainer.Config(
    maxDepths = Seq(5, 8, 12), stepSizes = Seq(0.05, 0.1, 0.3))
}

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

  /** Cached once per pipeline instance: the top-k scan runs a single time
    * and every stage reuses one cache entry (a `def` would re-build and
    * re-cache per access).
    */
  lazy val commodities: DataFrame =
    Commodities.commoditiesToScore(spark, cfg.sfDir, cfg.nCommodities).cache()

  /** One min/max scan per pipeline instance (EP2 scalar), not per access. */
  lazy val currentDay: LocalDate = graft.core.Retail.dayBounds(spark, cfg.sfDir)._2

  /** Feature snapshot for every grain as-of `day` (history ≤ day only),
    * upserted into the keyed tables (S8).
    */
  def computeFeatures(day: LocalDate): Unit = {
    val d = java.sql.Date.valueOf(day)
    val txAsOf = tx.filter(col("day") <= lit(d))
    val txcAsOf = txc.filter(col("day") <= lit(d))
    // one bounds job per distinct fact, shared across grains
    val hb = FeatureBuilder.bounds(txAsOf)
    val cb = FeatureBuilder.bounds(txcAsOf)
    def stamped(df: DataFrame) = df.withColumn("day", lit(d))
    householdFeatures.upsert(spark,
      stamped(FeatureBuilder.build(txAsOf, FeatureBuilder.household,
        knownBounds = Some(hb))))
    commodityFeatures.upsert(spark,
      stamped(FeatureBuilder.build(txcAsOf, FeatureBuilder.commodity,
        knownBounds = Some(cb))))
    householdCommodityFeatures.upsert(spark,
      stamped(FeatureBuilder.build(txcAsOf, FeatureBuilder.householdCommodity,
        knownBounds = Some(cb))))
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
  def trainAll(): Seq[(String, PropensityTrainer.Metrics)] = {
    val cur = currentDay
    val fed = cur.minusDays(LabelBuilder.horizonDays)
    val labels = LabelBuilder.labels(txc, commodities, fed).cache()
    val trainingSet = TrainingSetBuilder.build(labels, lookups).cache()
    try {
    val featureCols = trainingSet.columns.toSeq.filter(c => c.contains("__"))
    val cs = commodities.select("commodity_desc", "commodity_clean")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // sanitation (F5) is lossy — two commodities must never share a clean
    // name or their models/score columns would silently cross-wire
    require(cs.map(_._2).distinct.size == cs.size,
      s"commodity_clean collision in ${cs.map(_._2).mkString(",")}")
    val ratios = LabelBuilder.posRatio(labels)
      .filter(col("purchased") === 1)
      .select("commodity_desc", "class_ratio")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val out = cs.map { case (desc, clean) =>
      val slice = trainingSet.filter(col("commodity_desc") === desc)
      val weighted = PropensityTrainer.withWeights(slice, ratios.getOrElse(desc, 0.5))
      val (trainDf, valDf, test) = PropensityTrainer.split(weighted, cfg.trainer.seed)
      // TrainValidationSplit draws its own validation slice, so feed it
      // train ∪ val — otherwise the 15% val rows would contribute nothing
      val model = PropensityTrainer.train(
        trainDf.unionByName(valDf), featureCols, cfg.trainer)
      val metrics = PropensityTrainer.evaluate(model, test)
      // the reference logs all three per-commodity metrics to its tracking
      // service (04b:258-264); here they go to the job log
      println(s"[trainAll] $desc: $metrics")
      val v = models.save(clean, model)
      models.promote(clean, v)
      (desc, metrics)
    }
    out
    } finally {
      // a mid-loop train/save failure must not leave the two cached
      // frames pinned for the application lifetime
      labels.unpersist(); trainingSet.unpersist(); ()
    }
  }

  /** Daily (`04c`): refresh features if today's snapshot is missing (the
    * exact-day PIT join would otherwise silently score on fillna zeros),
    * score every (household, commodity), then write BOTH sinks — the
    * pivoted table in ONE grouped merge per day (not one table rewrite per
    * commodity) and the unpivoted append (S6).
    */
  def scoreAll(): DataFrame = {
    val cur = currentDay
    val d = java.sql.Date.valueOf(cur)
    // freshness gate checks ALL THREE feature tables: a computeFeatures
    // crash between the three upserts would otherwise leave commodity /
    // household-commodity snapshots missing and scoring would silently
    // proceed on fillna-0.0 features
    def hasSnapshot(t: FeatureTable): Boolean = t.exists &&
      t.read(spark).filter(col("day") === lit(d)).limit(1).count() > 0
    val hasToday = Seq(householdFeatures, commodityFeatures,
      householdCommodityFeatures).forall(hasSnapshot)
    if (!hasToday) computeFeatures(cur)
    val spine0 = tx.select("household_key").distinct()
      .crossJoin(broadcast(commodities.select("commodity_desc", "commodity_clean")))
      .withColumn("day", lit(d))
    val spine = TrainingSetBuilder.build(spine0, lookups).cache()
    var unpivoted: DataFrame = null
    try {
      val all = commodities.select("commodity_desc", "commodity_clean")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      // same collision guard as trainAll: two descs sanitizing to one
      // clean name would score both against one model
      require(all.map(_._2).distinct.size == all.size,
        s"commodity_clean collision in ${all.map(_._2).mkString(",")}")
      // the top-k control set drifts daily; a commodity that entered
      // since the last weekly train has no Production model yet — skip
      // it loudly instead of failing the whole daily job
      val (cs, missing) = all.partition { case (_, clean) => models.hasProduction(clean) }
      missing.foreach { case (desc, clean) =>
        System.err.println(s"[scoreAll] skipping '$desc': no Production model '$clean'")
      }
      require(cs.nonEmpty, "scoreAll: no commodity has a Production model — run trainAll first")
      val scored = cs.map { case (desc, clean) =>
        val slice = spine.filter(col("commodity_desc") === desc)
        val model = models.loadProduction(clean)
        Scorer.score(model, slice)
          .withColumn("commodity_clean", lit(clean))
      }
      unpivoted = scored.reduce(_.unionByName(_)).cache()
      val pivotedBatch = MergeWriter.pivotScores(
        unpivoted.withColumnRenamed("commodity_desc", "__cd")
          .withColumnRenamed("commodity_clean", "commodity_desc"),
        cs.map(_._2))
      pivoted.upsert(spark, pivotedBatch)
      val out = unpivoted.drop("commodity_clean")
      // day-partitioned DYNAMIC overwrite: a re-run of the same day (or a
      // retry after a crash between the two sinks) replaces that day's
      // partition instead of blindly appending duplicate score rows; new
      // days still accumulate (S6 semantics, made idempotent)
      out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(s"${cfg.workRoot}/propensities_unpivoted")
      out
    } finally {
      spine.unpersist()
      if (unpivoted != null) { unpivoted.unpersist(); () }
    }
  }
}
