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
