package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.features.FeatureTable
import graft.ops.Drift

/** Streaming distribution-drift monitor: maintain the CURRENT side of the
  * [[Drift]] statistics incrementally from a stream, against a frozen
  * training-time baseline — the production shape of model monitoring
  * (score/feature drift evaluated continuously, alert on PSI > 0.1/0.25).
  *
  * The monitor never stores or rescans raw data: each micro-batch folds
  * into a KEYED BIN TABLE (per-(group, bin) row counts — the same
  * additive-merge shape as [[IncrementalFeatures.mergeDaily]], on the
  * same FeatureTable upsert), and a drift report is one [[Drift.fromBins]]
  * pass over (baseline bins ⟗ running bins). State is bounded by
  * value-range / binWidth per group, independent of stream length.
  *
  * The batch twin of any prefix of the stream is exact: merging batches
  * b₁..bₙ then reporting equals `Drift.perGroup` over baseline ∪ (b₁..bₙ)
  * — bin counts are integers, addition is associative, and the stats
  * stage is shared code (pinned by StreamingSpec).
  */
object DriftMonitor {

  /** Bin one side: per-(group, bin) counts of `valueCol`. */
  def bins(df: DataFrame, groupCols: Seq[String], valueCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+
        floor(col(valueCol) / binWidth).cast("long").as("bin"): _*)
      .agg(count(lit(1)).as("bin_rows"))
  }

  /** Fold a micro-batch's bins into the running bin table (additive on
    * the (group, bin) PK — exact under any batch slicing).
    */
  def mergeBins(spark: SparkSession, table: FeatureTable,
      batchBins: DataFrame): Unit = {
    val keys = table.keys
    val combined =
      if (!table.exists) batchBins
      else {
        val touched = table.read(spark)
          .join(batchBins.select(keys.head, keys.tail: _*).distinct(),
            keys, "left_semi")
        touched.unionByName(batchBins)
          .groupBy(keys.map(col): _*)
          .agg(sum(col("bin_rows")).as("bin_rows"))
      }
    table.upsert(spark, combined)
  }

  /** Drift report: baseline bins (a) vs the running table (b), full-outer
    * joined on (group, bin) so bins seen by only one side still shape
    * both the smoothing and the CDFs.
    */
  def report(spark: SparkSession, table: FeatureTable,
      baselineBins: DataFrame, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols :+ "bin"
    val a = baselineBins.withColumnRenamed("bin_rows", "a")
    val b = table.read(spark)
      .select((keys.map(col) :+ col("bin_rows").as("b")): _*)
    val joined = a.join(b, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        coalesce(col("a"), lit(0L)).as("a"),
        coalesce(col("b"), lit(0L)).as("b")): _*)
    Drift.fromBins(joined, groupCols)
  }

  /** Drive a stream into the bin table (AvailableNow, drains then stops),
    * with the same at-least-once batchId replay guard as
    * [[IncrementalFeatures.run]] — an additive merge double-counts on
    * foreachBatch redelivery without it.
    */
  def run(spark: SparkSession, stream: DataFrame, table: FeatureTable,
      groupCols: Seq[String], valueCol: String, binWidth: Double,
      checkpoint: String): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > IncrementalFeatures.lastAppliedBatch(table, checkpoint)) {
          mergeBins(spark, table, bins(batch, groupCols, valueCol, binWidth))
          IncrementalFeatures.recordBatch(table, checkpoint, batchId)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
