package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.features.FeatureTable
import graft.streaming.{EventStreams, IncrementalFeatures}

/** Incremental = batch: slicing the event stream into micro-batches must
  * converge the feature table to the same state as one batch recompute.
  */
class IncrementalFeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.5, ""),
    (2L, ts("2024-01-01 11:00:00"), 100L, "view", 2.5, ""),
    (3L, ts("2024-01-02 10:00:00"), 200L, "click", 4.0, ""))
  private val batch2 = Seq(
    (4L, ts("2024-01-01 12:00:00"), 100L, "click", 3.0, ""), // same (100, 01-01) PK
    (5L, ts("2024-01-03 09:00:00"), 300L, "buy", 7.0, ""))

  private def toDF(rows: Seq[(Long, Timestamp, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("two merged micro-batches equal one batch recompute") {
    val t = FeatureTable(
      Files.createTempDirectory("inc").toString + "/t", Seq("user_id", "day"))
    IncrementalFeatures.mergeDaily(spark, t, IncrementalFeatures.dailyPartial(toDF(batch1)))
    IncrementalFeatures.mergeDaily(spark, t, IncrementalFeatures.dailyPartial(toDF(batch2)))
    val got = t.read(spark)
      .select(col("user_id"), col("day").cast("string"),
        col("n_events"), col("sum_value").cast("double"))
      .as[(Long, String, Long, Double)].collect().toSet
    val full = IncrementalFeatures.dailyPartial(toDF(batch1 ++ batch2))
      .select(col("user_id"), col("day").cast("string"),
        col("n_events"), col("sum_value").cast("double"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == full)
    assert(got.contains((100L, "2024-01-01", 3L, 7.0))) // merged across batches
  }

  test("replayed batchIds are skipped (at-least-once guard)") {
    val dir = Files.createTempDirectory("inc-replay").toString
    toDF(batch1).write.mode("overwrite").parquet(dir)
    val t = FeatureTable(
      Files.createTempDirectory("inc3").toString + "/t", Seq("user_id", "day"))
    val cp = Files.createTempDirectory("inc-cp3").toString
    // pretend batch 0 of THIS checkpoint was already applied: the drain
    // must skip it (markers are scoped to a checkpoint lineage)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t.root))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(t.root, "_last_batch"), cp + "\n999")
    IncrementalFeatures.run(spark, EventStreams.readEvents(spark, dir), t, cp)
    assert(!t.exists, "replayed batch must not be re-applied")
  }

  test("a marker from a DIFFERENT checkpoint does not suppress fresh data") {
    // batchIds restart at 0 with a new checkpoint: a marker keyed on the
    // old lineage must be ignored, or the new stream's data is lost
    val dir = Files.createTempDirectory("inc-replay2").toString
    toDF(batch1).write.mode("overwrite").parquet(dir)
    val t = FeatureTable(
      Files.createTempDirectory("inc4").toString + "/t", Seq("user_id", "day"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t.root))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(t.root, "_last_batch"), "/some/old/checkpoint\n999")
    val cp = Files.createTempDirectory("inc-cp4").toString
    IncrementalFeatures.run(spark, EventStreams.readEvents(spark, dir), t, cp)
    assert(t.exists, "new checkpoint lineage must apply its batches")
    assert(t.read(spark).count() > 0)
  }

  test("a LEGACY single-field marker is adopted into the resuming checkpoint") {
    // pre-upgrade writers recorded only the batchId; on an in-place
    // upgrade the marker must keep suppressing its already-applied batch
    // (treating it as 'nothing applied' would double-count on replay)
    val dir = Files.createTempDirectory("inc-replay3").toString
    toDF(batch1).write.mode("overwrite").parquet(dir)
    val t = FeatureTable(
      Files.createTempDirectory("inc5").toString + "/t", Seq("user_id", "day"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t.root))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(t.root, "_last_batch"), "999")
    val cp = Files.createTempDirectory("inc-cp5").toString
    IncrementalFeatures.run(spark, EventStreams.readEvents(spark, dir), t, cp)
    assert(!t.exists, "legacy marker must keep suppressing applied batches")
    // and the marker is rewritten in the checkpoint-qualified format
    val rewritten = java.nio.file.Files.readString(
      java.nio.file.Paths.get(t.root, "_last_batch"))
    assert(rewritten == cp + "\n999")
  }

  test("streaming foreachBatch path drains a directory into the table") {
    val dir = Files.createTempDirectory("inc-stream").toString
    toDF(batch1 ++ batch2).write.mode("overwrite").parquet(dir)
    val t = FeatureTable(
      Files.createTempDirectory("inc2").toString + "/t", Seq("user_id", "day"))
    val cp = Files.createTempDirectory("inc-cp").toString
    IncrementalFeatures.run(spark, EventStreams.readEvents(spark, dir), t, cp)
    assert(t.read(spark).count() == 3) // PKs: (100,01-01) (200,01-02) (300,01-03)
    val byUser = t.read(spark).groupBy("user_id")
      .agg(sum("n_events").as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    assert(byUser == Map(100L -> 3L, 200L -> 1L, 300L -> 1L))
  }
}
