package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.{AnomalyMonitor, EventStreams}

class AnomalyMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d")

  // 30 calm events around 10.0, then a spike, then calm, then a dip
  private val rows: Seq[(Long, Timestamp, Long, String, Double, String)] = {
    val calm = (0 until 30).map(i =>
      (i.toLong, ts(i), 1L, "pay", 10.0 + (i % 5) * 0.1, ""))
    val spike = Seq((30L, ts(30), 1L, "pay", 250.0, ""))
    val calm2 = (31 until 40).map(i =>
      (i.toLong, ts(i), 1L, "pay", 10.2, ""))
    val other = (0 until 25).map(i =>
      (100L + i, ts(i), 2L, "refund", 5.0 + (i % 3) * 0.05, ""))
    calm ++ spike ++ calm2 ++ other
  }

  private def df = rows.toDF("event_id", "ts", "user_id", "event_type",
    "value", "props")

  test("batch detector flags the spike, not the calm tail") {
    val flags = AnomalyMonitor.detectBatch(df, k = 3.0, minBase = 10)
      .collect()
    assert(flags.exists(r => r.getAs[Long]("event_id") == 30L),
      "spike must be flagged")
    // calm rows before the spike are never flagged
    assert(!flags.exists(r => r.getAs[Long]("event_id") < 30L))
    // the spike inflates the trailing std enough that 10.2 stays normal
    assert(flags.count(_.getAs[String]("event_type") == "pay") == 1)
  }

  test("z-score baseline uses only PRIOR events (no self-inclusion)") {
    // if the spike were included in its own baseline the z would shrink;
    // verify base_n of the spike's flag equals the 30 calm rows
    val f = AnomalyMonitor.detectBatch(df, 3.0, 10)
      .filter(col("event_id") === 30L).head()
    assert(f.getAs[Long]("base_n") == 30L)
    assert(f.getAs[Double]("z") > 100.0) // 240 above a ~0.14-std baseline
  }

  test("streaming run is value-identical to the batch twin") {
    val dir = Files.createTempDirectory("anomaly-stream").toString
    df.write.mode("overwrite").parquet(dir)
    val stream = EventStreams.readEvents(spark, dir)
    EventStreams.runToMemory(
      AnomalyMonitor.detectStream(stream, 3.0, 10).toDF(), "anomaly_flags")
    val streamed = spark.table("anomaly_flags")
      .as[(String, Long, Timestamp, Double, Long, Double, Double)]
      .collect().toSet
    val batch = AnomalyMonitor.detectBatch(df, 3.0, 10)
      .as[(String, Long, Timestamp, Double, Long, Double, Double)]
      .collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("state quantization keeps integer sums exact across splits") {
    // same data through 1 partition vs many: identical flags
    val a = AnomalyMonitor.detectBatch(df.repartition(1), 3.0, 10)
      .collect().toSet
    val b = AnomalyMonitor.detectBatch(df.repartition(7), 3.0, 10)
      .collect().toSet
    assert(a == b)
  }
}
