package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("K4: every node is in C(3,2)=3 triangles with coefficient 1") {
    val e = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
      .toDF("pa", "pb")
    val out = graft.ops.Triangles.perNode(e).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == Set(1, 2, 3, 4))
    out.values.foreach { case (deg, tri, coeff) =>
      assert(deg == 3L && tri == 3L && coeff == 1.0)
    }
  }

  test("triangle + pendant: pendant closes nothing, bridge node dilutes") {
    // 1-2-3 triangle, 4 hangs off 1
    val e = Seq((1, 2), (1, 3), (2, 3), (1, 4)).toDF("pa", "pb")
    val out = graft.ops.Triangles.perNode(e).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(4) == ((1L, 0L, 0.0)))
    assert(out(2) == ((2L, 1L, 1.0)) && out(3) == ((2L, 1L, 1.0)))
    // node 1: deg 3, 1 triangle → 2*1/(3*2) = 1/3 rounded to 9dp
    assert(out(1)._1 == 3L && out(1)._2 == 1L)
    assert(out(1)._3 == BigDecimal(1.0 / 3.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("two disjoint triangles count independently") {
    val e = Seq((1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12))
      .toDF("pa", "pb")
    val out = graft.ops.Triangles.perNode(e).collect()
    assert(out.length == 6)
    assert(out.forall(r => r.getLong(2) == 1L))
  }
}

class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("latest upsert wins; trailing delete suppresses the key") {
    val ev = Seq(
      // key (1,5): upsert then newer upsert → value 20 survives
      (1L, ts(1), 1L, "view", 10.0, """{"k": 5}"""),
      (2L, ts(2), 1L, "click", 20.0, """{"k": 5}"""),
      // key (1,6): upsert then newer delete → gone
      (3L, ts(1), 1L, "view", 30.0, """{"k": 6}"""),
      (4L, ts(2), 1L, "error", 0.0, """{"k": 6}"""),
      // key (2,5): delete then newer upsert → resurrected
      (5L, ts(1), 2L, "error", 0.0, """{"k": 5}"""),
      (6L, ts(2), 2L, "purchase", 40.0, """{"k": 5}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.streaming.EventOps.cdcLatestState(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(4))).toMap
    assert(out.keySet == Set((1L, 5L), (2L, 5L)))
    assert(out((1L, 5L)) == ((20.0, 2L)))
    assert(out((2L, 5L)) == ((40.0, 2L)))
  }

  test("same-second tie breaks by event_id") {
    val ev = Seq(
      (7L, ts(1), 3L, "view", 1.0, """{"k": 1}"""),
      (9L, ts(1), 3L, "view", 3.0, """{"k": 1}"""),
      (8L, ts(1), 3L, "view", 2.0, """{"k": 1}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.streaming.EventOps.cdcLatestState(ev).collect()
    assert(out.length == 1 && out(0).getDouble(2) == 3.0)
  }
}

class AttributionDecaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("single touch gets full credit; multi-touch shares sum to ~1") {
    val ev = Seq(
      // user 1: one view 10 min before purchase → share 1
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(10), 1L, "purchase", 50.0, "{}"),
      // user 2: views at t=0 and t=20, purchase at t=25
      (3L, ts(0), 2L, "view", 0.0, "{}"),
      (4L, ts(20), 2L, "view", 0.0, "{}"),
      (5L, ts(25), 2L, "purchase", 90.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = graft.streaming.EventOps.attributionTimeDecay(ev).collect()
    val u1 = rows.filter(_.getLong(0) == 1L)
    assert(u1.length == 1)
    assert(u1(0).getDouble(6) == 1.0)           // share
    assert(u1(0).getDouble(7) == 50.0)          // attributed_value
    val u2 = rows.filter(_.getLong(0) == 2L)
    assert(u2.length == 2 && u2.forall(_.getLong(4) == 2L)) // n_touches
    assert(math.abs(u2.map(_.getDouble(6)).sum - 1.0) < 1e-8)
    assert(math.abs(u2.map(_.getDouble(7)).sum - 90.0) < 1e-4)
    // the 5-minutes-ago view outweighs the 25-minutes-ago view
    val byView = u2.map(r => r.getLong(2) -> r.getDouble(6)).toMap
    assert(byView(4L) > byView(3L))
  }

  test("views outside the window get nothing") {
    val ev = Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(40), 1L, "purchase", 10.0, "{}") // 40 min > 30-min window
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(graft.streaming.EventOps.attributionTimeDecay(ev).count() == 0L)
  }
}

class LengthBatchingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-batch padding accounting is exact") {
    // one shard, wide buckets → a single bucket; 3 docs per batch
    val docs = Seq(
      (1L, "a b c"),       // 3 tokens
      (2L, "a b c d"),     // 4
      (3L, "a b c d e"),   // 5
      (4L, "a b")          // 2 → batch 1 (ordered by length: 2,3,4 | 5)
    ).toDF("doc_id", "text")
    val out = graft.text.Curation.lengthBatches(docs,
      bucketWidth = 1000, docsPerBatch = 3, shards = 1).collect()
      .map(r => r.getLong(2) -> (r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getDouble(7))).toMap
    // batch 0: lengths (2,3,4) → max 4, sum 9, padding 3*4-9=3, ratio 0.25
    assert(out(0L) == ((3L, 4L, 9L, 3L, 0.25)))
    // batch 1: single doc of 5 → zero padding
    assert(out(1L) == ((1L, 5L, 5L, 0L, 0.0)))
  }

  test("docs land in buckets by token count and batches never cross shards") {
    val docs = (1L to 200L).map(i => (i, ("w " * (i % 130).toInt).trim))
      .toDF("doc_id", "text")
    val out = graft.text.Curation.lengthBatches(docs,
      bucketWidth = 64, docsPerBatch = 8, shards = 4)
    // re-derive each batch member's bucket: max_len and min implied bucket agree
    val bad = out.filter(
      (col("max_len") / 64).cast("long") =!= col("bucket")).count()
    assert(bad == 0L)
    // capacity is never exceeded
    assert(out.filter(col("n_docs") > 8).count() == 0L)
  }
}

class LeakageSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("near-duplicate docs always share a split") {
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (
      Seq((1L, dup), (2L, dup + " tail"), (900L, dup)) ++ // near-dup cluster
        (10L to 40L).map(i => (i, s"unique document number $i with its own words ${i * 7} ${i * 13} ${i * 17} ${i * 19} ${i * 23}"))
    ).toDF("doc_id", "text")
    val out = graft.dedup.Clusters.leakageSafeSplit(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    // all three near-dups share cluster and split
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(900L)._1 == 1L)
    assert(Set(out(1L)._2, out(2L)._2, out(900L)._2).size == 1)
    // split labels are the hash-split vocabulary
    assert(out.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
  }
}

class CdcStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming Update-mode CDC compaction agrees with the batch twin") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 10.0, """{"k": 5}"""),
      (2L, ts("2024-01-01 10:00:05"), 1L, "click", 20.0, """{"k": 5}"""),
      (3L, ts("2024-01-01 10:00:00"), 1L, "view", 30.0, """{"k": 6}"""),
      (4L, ts("2024-01-01 10:00:05"), 1L, "error", 0.0, """{"k": 6}"""),
      (5L, ts("2024-01-01 10:00:00"), 2L, "purchase", 40.0, """{"k": 7}""")
    )
    val dir = java.nio.file.Files.createTempDirectory("cdc-stream").toString
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.mode("overwrite").parquet(dir)

    val q = graft.streaming.EventStreams
      .cdcLatestStream(graft.streaming.EventStreams.readEvents(spark, dir))
      .writeStream.outputMode("update").format("memory").queryName("cdc")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("cdc").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getDouble(3), r.getLong(5))).toMap
    val batch = graft.streaming.EventOps
      .cdcLatestWithTombstones(df.withColumn("ts",
        date_trunc("second", col("ts"))))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getDouble(3), r.getLong(5))).toMap
    assert(streamed == batch)
    // the delete key arrives as a tombstone, not silently dropped
    assert(streamed((1L, 6L))._1 == "delete")
    assert(streamed((1L, 5L)) == (("upsert", 20.0, 2L)))
  }
}
