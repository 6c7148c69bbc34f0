package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.features.FeatureTable

/** Incremental feature maintenance: stream → aggregate → keyed upsert.
  *
  * The reference refreshes features by re-running the whole batch daily
  * (`03_Define_Workflow.py:96-99`); SURVEY.md §2.9 notes the design leaves
  * room for a streaming path. This is that path: a `foreachBatch` sink
  * that folds each micro-batch into the keyed FeatureTable with the same
  * anti-join+union upsert the batch pipeline uses — so batch and
  * streaming writers share one table format and one merge semantic.
  *
  * The per-batch aggregate is a partial (per-micro-batch) summary keyed by
  * (user, day); `mergeDaily` re-aggregates the table's matching PK rows
  * with the incoming partial before upserting, keeping the table exact
  * under any batch slicing. At scale the micro-batch side is tiny vs the
  * table → Spark broadcasts the anti-join probe; the table rewrite is the
  * same cost as the reference's daily refresh but runs per-batch on only
  * the touched partitions (day-partitioned table).
  */
object IncrementalFeatures {

  /** Daily per-user activity partial for one micro-batch. */
  def dailyPartial(batch: DataFrame): DataFrame =
    batch.groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).as("sum_value"))

  /** Merge a partial into the table exactly: existing matching PK rows are
    * re-combined (counts add, decimal sums add) instead of overwritten.
    */
  def mergeDaily(spark: SparkSession, table: FeatureTable, partial: DataFrame): Unit = {
    val keys = table.keys
    val combined =
      if (!table.exists) partial
      else {
        val existing = table.read(spark)
          .join(partial.select(keys.head, keys.tail: _*).distinct(), keys, "left_semi")
        existing.unionByName(partial)
          .groupBy(keys.map(col): _*)
          .agg(
            sum(col("n_events")).as("n_events"),
            sum(col("sum_value")).as("sum_value"))
      }
    table.upsert(spark, combined)
  }

  /** foreachBatch is at-least-once: after a crash between sink commit and
    * checkpoint commit, the same batchId is re-delivered. The additive
    * merge would double-count on replay, so the table records the last
    * applied batchId and replays are skipped. (The marker is written after
    * the table swap; the residual crash window between the two writes is
    * inherent to any two-file commit without a transaction log — a real
    * table format closes it with a single atomic commit.)
    */
  /** Marker format: `<checkpoint>\n<batchId>`. batchIds are only
    * monotonic WITHIN one checkpoint lineage — a fresh checkpoint
    * restarts at 0, so a marker keyed on batchId alone would silently
    * drop the new stream's first batches. A marker from a different
    * checkpoint is therefore ignored (treated as "nothing applied").
    */
  private[streaming] def lastAppliedBatch(table: FeatureTable, checkpoint: String): Long = {
    val marker = java.nio.file.Paths.get(table.root, "_last_batch")
    if (!java.nio.file.Files.exists(marker)) -1L
    else java.nio.file.Files.readString(marker).split("\n", 2) match {
      case Array(ck, id) if ck == checkpoint => id.trim.toLong
      case Array(legacyId) if scala.util.Try(legacyId.trim.toLong).isSuccess =>
        // Legacy single-field marker (pre checkpoint-qualified format):
        // ASSUME it belongs to the lineage resuming here — treating it as
        // "nothing applied" would re-apply its last batch on the first
        // crash-replay after an in-place upgrade and double-count the
        // additive merge. The assumption is deliberate and one-shot (the
        // marker is rewritten checkpoint-qualified immediately): if the
        // resumer is instead a BRAND-NEW checkpoint pointed at a
        // legacy-marked table, batches up to the legacy id are skipped —
        // but replaying a fresh stream into an existing additive table
        // double-counts EVERYTHING regardless of markers, so that
        // operation requires clearing the table (and with it the marker).
        val id = legacyId.trim.toLong
        recordBatch(table, checkpoint, id)
        id
      case _ => -1L // different checkpoint lineage (or unreadable marker)
    }
  }

  private[streaming] def recordBatch(table: FeatureTable, checkpoint: String,
      batchId: Long): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(table.root))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(table.root, "_last_batch"),
      checkpoint + "\n" + batchId)
  }

  /** Wire a streaming events frame into the table; AvailableNow drains
    * whatever is in the source directory and stops (bounded replay).
    */
  def run(spark: SparkSession, events: DataFrame, table: FeatureTable,
      checkpoint: String): StreamingQuery = {
    val q = events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastAppliedBatch(table, checkpoint)) {
          mergeDaily(spark, table, dailyPartial(batch))
          recordBatch(table, checkpoint, batchId)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
