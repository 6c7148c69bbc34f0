package graft.train

import java.nio.file.{Files, Paths}
import org.apache.spark.ml.PipelineModel

/** Directory-per-model registry (SURVEY.md §1.1 "model-per-group"): the
  * reference addresses models by URI `models:/propensity <commodity>/
  * Production` in MLflow (`04c:94`, promote `04b:437-443`); without
  * MLflow, a model is a directory `root/<commodityClean>/<version>` and
  * "Production" is a pointer file naming the promoted version.
  */
final case class ModelStore(root: String) {

  private def cleanDir(commodityClean: String) = Paths.get(root, commodityClean)

  def save(commodityClean: String, model: PipelineModel): String = {
    val version = System.currentTimeMillis().toString
    val dir = cleanDir(commodityClean).resolve(version)
    model.write.overwrite().save(dir.toString)
    version
  }

  /** Promote a saved version to Production (`04b:437-443`). */
  def promote(commodityClean: String, version: String): Unit = {
    Files.createDirectories(cleanDir(commodityClean))
    Files.writeString(cleanDir(commodityClean).resolve("PRODUCTION"), version)
  }

  def loadProduction(commodityClean: String): PipelineModel = {
    val v = Files.readString(cleanDir(commodityClean).resolve("PRODUCTION")).trim
    PipelineModel.load(cleanDir(commodityClean).resolve(v).toString)
  }

  def hasProduction(commodityClean: String): Boolean =
    Files.exists(cleanDir(commodityClean).resolve("PRODUCTION"))
}
