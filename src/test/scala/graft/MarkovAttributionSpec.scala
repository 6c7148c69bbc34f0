package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.ops.MarkovAttribution

class MarkovAttributionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, String, Long, String)*) =
    rows.map { case (id, t, u, ty) =>
      (id, Timestamp.valueOf(t), u, ty, 1.0, """{"k": 1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("transitions: start entry, purchase absorbs and truncates, null end") {
    // user 1, one session: view → click → purchase → view(ignored)
    // user 2, one session: view → error (no conversion)
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "click"),
      (3L, "2024-01-01 10:10:00", 1L, "purchase"),
      (4L, "2024-01-01 10:15:00", 1L, "view"), // post-conversion: dropped
      (5L, "2024-01-01 11:00:00", 2L, "view"),
      (6L, "2024-01-01 11:05:00", 2L, "error"))
    val t = MarkovAttribution.transitions(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(t == Map(
      ("__START__", "view") -> 2L,
      ("view", "click") -> 1L,
      ("click", "__CONV__") -> 1L,
      ("view", "error") -> 1L,
      ("error", "__NULL__") -> 1L))
  }

  test("removal effect: cutting the only converting path zeroes absorption") {
    // Both journeys convert only through click: START→view→click→CONV and
    // START→click→CONV. Removing click must zero conversion; removing
    // view only kills the first journey.
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "click"),
      (3L, "2024-01-01 10:10:00", 1L, "purchase"),
      (4L, "2024-01-02 10:00:00", 2L, "click"),
      (5L, "2024-01-02 10:05:00", 2L, "purchase"))
    val out = MarkovAttribution(df, channels = Seq("view", "click"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val (bView, remView, effView) = out("view")
    val (bClick, remClick, effClick) = out("click")
    assert(bView == bClick) // same base
    assert(bView == 1.0)    // every journey converts
    assert(remClick == 0.0 && effClick == 1.0)
    // removing view: START→click (p=0.5) →CONV (p=1) remains → 0.5
    assert(remView == 0.5 && effView == 0.5)
  }

  test("effects are nonnegative and bounded by the base (no renormalize)") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "signup"),
      (3L, "2024-01-01 10:06:00", 1L, "purchase"),
      (4L, "2024-01-01 12:00:00", 2L, "view"),
      (5L, "2024-01-01 12:30:01", 2L, "click"), // new session (gap > 30m)
      (6L, "2024-01-01 12:31:00", 2L, "error"))
    val rows = MarkovAttribution(df,
      channels = Seq("view", "click", "signup", "error")).collect()
    rows.foreach { r =>
      val (pb, pr, eff) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(eff >= 0.0 && pr <= pb && pb <= 1.0)
      assert(math.abs(pb - pr - eff) < 1e-12)
    }
  }

  test("shares sum to ~1 when any effect is positive") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "click"),
      (3L, "2024-01-01 10:10:00", 1L, "purchase"),
      (4L, "2024-01-01 11:00:00", 2L, "view"),
      (5L, "2024-01-01 11:05:00", 2L, "error"))
    val shares = MarkovAttribution(df, channels = Seq("view", "click", "error"))
      .collect().flatMap(r =>
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    assert(math.abs(shares.sum - 1.0) < 1e-6)
  }
}
