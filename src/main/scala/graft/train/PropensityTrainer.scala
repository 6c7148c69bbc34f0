package graft.train

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.tuning.{ParamGridBuilder, TrainValidationSplit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-commodity propensity model training (SURVEY.md U2/U4).
  *
  * The reference trains XGBoost via hyperopt `SparkTrials`
  * (`04b:228-311`, `:370-411`); this environment has MLlib only, so the
  * mapping is: XGBClassifier → `GBTClassifier` (or `LogisticRegression`
  * for a fast linear baseline), TPE search → `ParamGridBuilder` +
  * `TrainValidationSplit(parallelism=n)` (trials run as parallel Spark
  * jobs, like SparkTrials), `scale_pos_weight` → a `weightCol` derived
  * from the positive-class ratio (`04b:385-388`), loss = −average
  * precision → `BinaryClassificationEvaluator("areaUnderPR")`
  * (`04b:254,266`). Splits are seeded `randomSplit(.7/.15/.15)`
  * (`04b:366-367`) for determinism.
  *
  * Unlike the reference — which `toPandas()`es the whole feature matrix to
  * the driver (`04b:361`) — the training set never leaves the cluster:
  * VectorAssembler and the estimator run distributed, which is the entire
  * point at 100 TB.
  */
object PropensityTrainer {

  /** Defaults mirror the reference's tuning budget in grid form
    * (`04b:378-395`): hyperopt explores `max_depth` ∈ [5, 20] and
    * `learning_rate` ∈ [0.01, 0.40] with ≥50 TPE evals; the grid samples
    * the same ranges at 4×3 = 12 points, and trials run as parallel
    * Spark jobs (`parallelism` = local cores, like `SparkTrials`).
    * XGBoost→GBT delta: MLlib's GBT has no `scale_pos_weight` /
    * `min_child_weight` / histogram tricks — imbalance is handled by the
    * `weightCol` instead (`withWeights`), and depth beyond ~12 is
    * disproportionately slow on GBT, so the depth samples stop there.
    */
  final case class Config(
      algo: String = "gbt", // "gbt" | "lr"
      maxDepths: Seq[Int] = Seq(3, 5, 8, 12),
      stepSizes: Seq[Double] = Seq(0.05, 0.1, 0.3),
      maxIter: Int = 20,
      parallelism: Int = Runtime.getRuntime.availableProcessors(),
      seed: Long = 42L)

  /** Train/validate/test split mirroring `04b:366-367`. */
  def split(df: DataFrame, seed: Long): (DataFrame, DataFrame, DataFrame) = {
    val Array(tr, va, te) = df.randomSplit(Array(0.7, 0.15, 0.15), seed)
    (tr, va, te)
  }

  /** Class-imbalance weight column from the positive ratio (`04b:385-388`):
    * positives weigh 1/posRatio (capped), negatives 1.0.
    */
  def withWeights(df: DataFrame, posRatio: Double): DataFrame = {
    val w = math.min(1.0 / math.max(posRatio, 1e-6), 100.0)
    df.withColumn("weight",
      when(col("purchased") === 1, lit(w)).otherwise(lit(1.0)))
  }

  def train(trainingSet: DataFrame, featureCols: Seq[String],
      cfg: Config = Config()): PipelineModel = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .setHandleInvalid("keep")
    val labeled = trainingSet
      .withColumn("label", col("purchased").cast("double"))

    val (estimator, grid) = cfg.algo match {
      case "lr" =>
        val lr = new LogisticRegression()
          .setWeightCol("weight").setMaxIter(cfg.maxIter)
        (lr, new ParamGridBuilder()
          .addGrid(lr.regParam, Array(0.0, 0.01)).build())
      case _ =>
        val gbt = new GBTClassifier()
          .setWeightCol("weight").setMaxIter(cfg.maxIter).setSeed(cfg.seed)
        (gbt, new ParamGridBuilder()
          .addGrid(gbt.maxDepth, cfg.maxDepths.toArray)
          .addGrid(gbt.stepSize, cfg.stepSizes.toArray).build())
    }
    val evaluator = new BinaryClassificationEvaluator()
      .setMetricName("areaUnderPR")
    val tvs = new TrainValidationSplit()
      .setEstimator(estimator).setEstimatorParamMaps(grid)
      .setEvaluator(evaluator).setTrainRatio(0.8)
      .setParallelism(cfg.parallelism).setSeed(cfg.seed)
    val pipe = new Pipeline().setStages(Array(assembler, tvs))
    pipe.fit(labeled)
  }

  /** The reference's three tracked model-quality metrics (`04b:254-256`,
    * `04b:297-309`): average precision, balanced accuracy, Matthews
    * correlation coefficient.
    */
  final case class Metrics(
      avgPrecision: Double, balancedAccuracy: Double, mcc: Double) {
    override def toString: String =
      f"avg_precision=$avgPrecision%.4f balanced_accuracy=$balancedAccuracy%.4f mcc=$mcc%.4f"
  }

  /** Balanced accuracy + MCC from confusion counts, computed in ONE
    * distributed aggregate over the scored frame (the reference computes
    * them driver-side via sklearn on a pandas matrix, `04b:254-256`).
    * Conventions: MCC is 0.0 when any confusion margin is empty
    * (sklearn's zero-division behavior); an absent class contributes a
    * 0.0 recall term to balanced accuracy.
    */
  def confusionMetrics(scored: DataFrame,
      labelCol: String = "label", predCol: String = "prediction"): (Double, Double) = {
    val l = col(labelCol)
    val p = col(predCol)
    // count(when(...)) is 0 (never null) on an empty frame — sum() would
    // return null and NPE the unboxing below
    def cnt(c: org.apache.spark.sql.Column) = count(when(c, 1))
    val row = scored.agg(
      cnt(l === 1.0 && p === 1.0).as("tp"),
      cnt(l === 0.0 && p === 1.0).as("fp"),
      cnt(l === 0.0 && p === 0.0).as("tn"),
      cnt(l === 1.0 && p === 0.0).as("fn")).head()
    val (tp, fp, tn, fn) =
      (row.getLong(0).toDouble, row.getLong(1).toDouble,
        row.getLong(2).toDouble, row.getLong(3).toDouble)
    def rate(num: Double, den: Double) = if (den == 0.0) 0.0 else num / den
    val ba = (rate(tp, tp + fn) + rate(tn, tn + fp)) / 2.0
    val den = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    val mcc = if (den == 0.0) 0.0 else (tp * tn - fp * fn) / den
    (ba, mcc)
  }

  /** All three tracked metrics on a held-out frame (`04b:297-309`). */
  def evaluate(model: PipelineModel, test: DataFrame): Metrics = {
    val scored = model
      .transform(test.withColumn("label", col("purchased").cast("double")))
      .select("label", "prediction", "rawPrediction")
      .cache() // score once, read twice (AP + confusion)
    try {
      val ap = new BinaryClassificationEvaluator()
        .setMetricName("areaUnderPR").evaluate(scored)
      val (ba, mcc) = confusionMetrics(scored)
      Metrics(ap, ba, mcc)
    } finally { scored.unpersist(); () }
  }
}
