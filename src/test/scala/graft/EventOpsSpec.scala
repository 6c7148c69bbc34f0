package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventOps

class EventOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val ev = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.0, ""),
    (2L, ts("2024-01-01 10:05:00"), 100L, "click", 2.0, ""),
    (3L, ts("2024-01-01 10:10:00"), 100L, "view", 4.0, ""),
    (4L, ts("2024-01-01 10:15:00"), 100L, "view", 8.0, ""),
    (5L, ts("2024-01-02 09:00:00"), 200L, "click", 5.0, "")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("events reader surfaces both fixture ts encodings identically") {
    // Fixture generations have drifted between TIMESTAMP(NANOS) (read as
    // an epoch-nano LONG under the nanosAsLong conf) and TIMESTAMP(MICROS);
    // the round-5 regeneration broke 11 queries. Pin both branches: the
    // same instants written as micros timestamps and as nano longs must
    // read back as the same second-truncated timestamps.
    import org.apache.spark.sql.functions._
    val base = java.time.Instant.parse("2024-01-01T10:00:00.123456Z")
    val instants = (0 until 5).map(i => base.plusSeconds(i * 90))
    def dirFor(name: String): String =
      s"/tmp/graft-test-events-$name-${System.nanoTime()}"
    val microsDir = dirFor("micros")
    instants.zipWithIndex
      .map { case (t, i) => (i.toLong, Timestamp.from(t), i.toLong,
        "click", 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$microsDir/events.parquet")
    val nanosDir = dirFor("nanos")
    instants.zipWithIndex
      .map { case (t, i) => (i.toLong,
        t.getEpochSecond * 1000000000L + t.getNano, i.toLong,
        "click", 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$nanosDir/events.parquet")
    def read(dir: String): Seq[(Long, Timestamp)] =
      EventOps.events(spark, dir).select("event_id", "ts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq.sortBy(_._1)
    val m = read(microsDir)
    val n = read(nanosDir)
    assert(m == n, s"micros=$m nanos=$n")
    // second truncation: the .123456 fraction is gone
    assert(m.head._2 == Timestamp.from(
      java.time.Instant.parse("2024-01-01T10:00:00Z")))
  }

  test("rollingFeatures: lag, 3-event window, running total, index") {
    val out = EventOps.rollingFeatures(ev).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    def f(id: Long, c: String) = Option(out(id).getAs[java.lang.Double](c))
    assert(out(1L).getAs[Long]("event_index") == 1L)
    assert(f(1L, "prev_value").isEmpty && f(2L, "prev_value") == Some(1.0))
    assert(f(3L, "sum_3") == Some(7.0))   // 1 + 2 + 4
    assert(f(4L, "sum_3") == Some(14.0))  // 2 + 4 + 8
    assert(f(4L, "avg_3") == Some(14.0 / 3.0))
    assert(f(4L, "cum_value") == Some(15.0))
    assert(f(5L, "sum_3") == Some(5.0) && out(5L).getAs[Long]("event_index") == 1L)
  }

  test("rollingFeatures: all five windows share one shuffle and one Window") {
    val qe = EventOps.rollingFeatures(ev).queryExecution
    qe.executedPlan.execute().count() // finalize AQE on THIS plan instance
    val p = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1, p)
    assert(p.sliding("Window".length).count(_ == "Window") == 1, p)
  }

  test("funnel: earliest strictly-ordered chain, stage gating") {
    val fev = Seq(
      // user 100: full chain, and a decoy click BEFORE the first view
      (1L, ts("2024-01-01 09:00:00"), 100L, "click", 0.0, ""),
      (2L, ts("2024-01-01 10:00:00"), 100L, "view", 0.0, ""),
      (3L, ts("2024-01-01 10:30:00"), 100L, "click", 0.0, ""),
      (4L, ts("2024-01-01 11:00:00"), 100L, "purchase", 0.0, ""),
      // user 200: view then purchase but never a click → stage 1 only
      (5L, ts("2024-01-01 10:00:00"), 200L, "view", 0.0, ""),
      (6L, ts("2024-01-01 11:00:00"), 200L, "purchase", 0.0, ""),
      // user 300: click+purchase but no view → absent from the funnel
      (7L, ts("2024-01-01 10:00:00"), 300L, "click", 0.0, ""),
      (8L, ts("2024-01-01 11:00:00"), 300L, "purchase", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.funnel(fev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out.keySet == Set(100L, 200L))
    assert(out(100L).getAs[Long]("reached_stage") == 3L)
    // the decoy 09:00 click is ignored: step 2 is the 10:30 click
    assert(out(100L).getAs[Timestamp]("step2_ts") == ts("2024-01-01 10:30:00"))
    assert(out(200L).getAs[Long]("reached_stage") == 1L)
    assert(out(200L).isNullAt(out(200L).fieldIndex("step2_ts")))
    // stage 3 requires stage 2: the purchase alone does not count
    assert(out(200L).isNullAt(out(200L).fieldIndex("step3_ts")))
  }

  test("cohorts: first-seen day by day offset, distinct users") {
    val out = EventOps.cohorts(ev).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Long]("day_offset")) -> r.getAs[Long]("n_users")).toMap
    // user 100 is a 2024-01-01 cohort active only that day; user 200
    // first appears 2024-01-02
    assert(out == Map(
      ("2024-01-01", 0L) -> 1L,
      ("2024-01-02", 0L) -> 1L))
    // a user active on a later day lands in the offset cell
    val ev2 = ev.union(Seq(
      (6L, ts("2024-01-03 10:00:00"), 100L, "click", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out2 = EventOps.cohorts(ev2).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Long]("day_offset")) -> r.getAs[Long]("n_users")).toMap
    assert(out2(("2024-01-01", 2L)) == 1L)
  }
}
