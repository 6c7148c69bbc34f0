package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

class ScdPitLookupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("spine rows resolve to the covering interval; boundaries are [from, to)") {
    val dim = Seq(
      (1L, "bronze", d("2024-01-01"), Option(d("2024-01-10")), 3L),
      (1L, "gold", d("2024-01-10"), None, 2L)
    ).toDF("user_id", "tier", "valid_from", "valid_to", "n_obs")
    val spine = Seq(
      (1L, d("2023-12-25")), // before any interval → null
      (1L, d("2024-01-01")), // first day of bronze
      (1L, d("2024-01-09")), // last bronze day
      (1L, d("2024-01-10")), // boundary: gold opens, bronze closed (exclusive)
      (1L, d("2024-03-01")), // open current interval
      (2L, d("2024-01-05"))  // unknown key → null
    ).toDF("user_id", "day")
    val out = graft.ops.Scd.pitLookup(spine, dim, Seq("user_id"), "day")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) ->
        Option(r.getString(2))).toMap
    assert(out((1L, "2023-12-25")).isEmpty)
    assert(out((1L, "2024-01-01")).contains("bronze"))
    assert(out((1L, "2024-01-09")).contains("bronze"))
    assert(out((1L, "2024-01-10")).contains("gold"))
    assert(out((1L, "2024-03-01")).contains("gold"))
    assert(out((2L, "2024-01-05")).isEmpty)
    assert(out.size == 6) // disjoint intervals → no fan-out
  }

  test("round-trips type2: every observation resolves to its own run") {
    val obs = Seq(
      (1L, d("2024-01-01"), "a"), (1L, d("2024-01-02"), "a"),
      (1L, d("2024-01-03"), "b"), (1L, d("2024-01-04"), "a")
    ).toDF("user_id", "day", "attr")
    val dim = graft.ops.Scd.type2(obs, Seq("user_id"), "day", "attr")
    val back = graft.ops.Scd.pitLookup(
      obs.select("user_id", "day"), dim, Seq("user_id"), "day")
      .select(col("user_id"), col("day"), col("attr"))
      .collect().map(r => r.getDate(1).toString -> r.getString(2)).toMap
    assert(back == Map("2024-01-01" -> "a", "2024-01-02" -> "a",
      "2024-01-03" -> "b", "2024-01-04" -> "a"))
  }
}

class LoadCompletenessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a missing calendar day surfaces as an explicit zero row") {
    // 20 baseline days of 10 events, then a GAP day, then one more day
    val rows = (0 until 20).flatMap { day =>
      (0 until 10).map(i => ((day * 10 + i).toLong,
        Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"),
        1L, "view", 1.0, "{}"))
    } :+ ((999L, Timestamp.valueOf("2024-01-22 12:00:00"),
      1L, "view", 1.0, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.streaming.EventOps.loadCompleteness(ev).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getBoolean(5))).toMap
    assert(out.size == 22) // full calendar incl. the gap
    assert(out("2024-01-21") == ((0L, true)))  // missing day → zero + alarm
    assert(out("2024-01-22")._1 == 1L)
    assert(out("2024-01-22")._2)               // 1 event vs mean ~9.5 → alarm
    assert(out("2024-01-20") == ((10L, false)))
    assert(!out("2024-01-01")._2)              // no baseline yet → no alarm
  }

  test("short history never alarms (needs 14 baseline days)") {
    val rows = (0 until 5).map(i => (i.toLong,
      Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"),
      1L, "view", 1.0, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.streaming.EventOps.loadCompleteness(ev).collect()
    assert(out.forall(!_.getBoolean(5)))
  }
}

/** Plan pins for the wave 4-7 operators (PlanSpec conventions). */
class Wave7PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("triangle wedge enumeration plans equi-joins, never a cartesian product") {
    val e = (1 to 40).flatMap(i => Seq((i, i + 1), (i, i + 2)))
      .toDF("pa", "pb")
    val p = plan(graft.ops.Triangles.perNode(e))
    assert(!p.contains("CartesianProduct"),
      s"wedge/closing joins must stay keyed:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"wedge/closing joins must stay equi-keyed:\n$p")
  }

  test("CDC compaction is one partial-aggregable hash aggregate") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, "view", 1.0, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val p = plan(graft.streaming.EventOps.cdcLatestState(ev))
    // struct max is not Tungsten-hashable (plans as SortAggregate sorted
    // on the grouping key only), but what makes it scale is the
    // partial/final split: partial_max BEFORE the exchange means the
    // shuffle carries one champion per (partition, key), never history
    assert(p.contains("partial_max"),
      s"argmax must combine map-side before the exchange:\n$p")
    assert(!p.contains("Window"), s"argmax must not plan a window sort:\n$p")
  }

  test("length batching windows are sharded, never a single global partition") {
    val docs = (1L to 50L).map(i => (i, "w " * (i % 20).toInt))
      .toDF("doc_id", "text")
    val p = plan(graft.text.Curation.lengthBatches(docs))
    assert(p.contains("Window"), s"expected the batching window:\n$p")
    // the window partitions by (bucket, shard) — hashpartitioning on both
    assert(p.contains("hashpartitioning(bucket"),
      s"window must partition by (bucket, shard):\n$p")
  }

  test("time-decay attribution keeps the user-keyed interval join shape") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val p = plan(graft.streaming.EventOps.attributionTimeDecay(ev))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"touch join must stay keyed on user:\n$p")
  }

  test("SCD2 PIT lookup joins on the key, interval bound as predicate") {
    val dim = Seq((1L, "a", java.sql.Date.valueOf("2024-01-01"),
      Option.empty[java.sql.Date], 1L))
      .toDF("user_id", "tier", "valid_from", "valid_to", "n_obs")
    val spine = Seq((1L, java.sql.Date.valueOf("2024-01-02")))
      .toDF("user_id", "day")
    val p = plan(graft.ops.Scd.pitLookup(spine, dim, Seq("user_id"), "day"))
    assert(!p.contains("CartesianProduct"),
      s"PIT lookup must stay an equi-join on the key:\n$p")
  }
}
