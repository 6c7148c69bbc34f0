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

  final case class Config(
      algo: String = "gbt", // "gbt" | "lr"
      maxDepths: Seq[Int] = Seq(3, 5),
      stepSizes: Seq[Double] = Seq(0.1),
      maxIter: Int = 20,
      parallelism: Int = 4,
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

  /** areaUnderPR on a held-out frame (model-quality tracking, `04b:297-309`). */
  def evaluate(model: PipelineModel, test: DataFrame): Double = {
    val scored = model.transform(test.withColumn("label", col("purchased").cast("double")))
    new BinaryClassificationEvaluator().setMetricName("areaUnderPR").evaluate(scored)
  }
}
