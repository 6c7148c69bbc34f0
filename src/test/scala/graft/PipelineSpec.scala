package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{PipelineConfig, PropensityPipeline}
import graft.train.PropensityTrainer

/** End-to-end pipeline integration on sf0.001: init (feature snapshots at
  * two days) → weekly train → daily score → pivoted + unpivoted sinks.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val p = {
    val cfg = PipelineConfig(
      sfDir = "/root/testdata/sf0.001",
      workRoot = Files.createTempDirectory("pipe-spec").toString,
      nCommodities = 1,
      trainer = PropensityTrainer.Config(algo = "lr", regParams = Seq(0.0, 0.01), maxIter = 5, parallelism = 2))
    val pp = new PropensityPipeline(spark, cfg)
    pp.init()
    pp
  }

  test("init writes three keyed feature tables with two day snapshots each") {
    Seq(p.householdFeatures, p.commodityFeatures, p.householdCommodityFeatures)
      .foreach { t =>
        assert(t.exists)
        val days = t.read(spark).select("day").distinct().count()
        assert(days == 2, s"${t.root} should hold snapshots for 2 days, got $days")
      }
  }

  test("train → score produces bounded propensities and both sinks") {
    val metrics = p.trainAll()
    assert(metrics.size == 1)
    val scored = p.scoreAll()
    val stats = scored.agg(
      count(lit(1)), min(col("prediction")), max(col("prediction"))).head()
    assert(stats.getLong(0) > 0)
    assert(stats.getDouble(1) >= 0.0 && stats.getDouble(2) <= 1.0)
    // pivoted sink has one column per scored commodity + PK
    val piv = p.pivoted.read(spark)
    assert(piv.columns.length == 3) // household_key, day, one commodity col
    assert(piv.count() == scored.select("household_key").distinct().count())
  }
}
