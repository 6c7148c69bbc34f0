package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.train.PropensityTrainer

/** The flagship end-to-end run used by SparkEntry.entry (driver t1 smoke):
  * the full reference DAG — silver ingest → feature snapshots at
  * {cur−30, cur} → per-commodity training → batch scoring → pivoted merge
  * + unpivoted append — on sf0.001, scaled down to 2 commodities and the
  * linear trainer so the smoke stays fast. Returns the unpivoted
  * propensities (rows > 0 ⇔ every stage produced output).
  */
object Flagship {
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val work = Files.createTempDirectory("graft-flagship").toString
    val cfg = PipelineConfig(
      sfDir = sfDir, workRoot = work, nCommodities = 2,
      trainer = PropensityTrainer.Config(algo = "lr", regParams = Seq(0.0, 0.01), maxIter = 10, parallelism = 2))
    val p = new PropensityPipeline(spark, cfg)
    p.init()
    p.trainAll()
    val out = p.scoreAll()
      .localCheckpoint(true) // materialize, then reclaim the work dir
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    out
  }
}
