package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date
import graft.ops.Forecast

class ForecastSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rndDiv: half-up away from zero, symmetric") {
    assert(Forecast.rndDiv(7, 4) == 2)   // 1.75 → 2
    assert(Forecast.rndDiv(6, 4) == 2)   // 1.5 → 2 (half up)
    assert(Forecast.rndDiv(5, 4) == 1)   // 1.25 → 1
    assert(Forecast.rndDiv(-6, 4) == -2) // -1.5 → -2 (away from zero)
    assert(Forecast.rndDiv(-5, 4) == -1)
    assert(Forecast.rndDiv(0, 8) == 0)
  }

  test("holt: hand-computed integer recursion") {
    val s = Seq(
      ("g", Date.valueOf("2024-01-01"), 10000L),  // y=1.0
      ("g", Date.valueOf("2024-01-02"), 20000L),  // y=2.0
      ("g", Date.valueOf("2024-01-03"), 20000L)
    ).toDF("grp", "day", "y4")
    val out = Forecast.holt(s, Seq("grp"), "day", "y4")
      .orderBy("day").select("y4", "level4", "trend4")
      .as[(Long, Long, Long)].collect().toSeq
    // t1: lvl=10000, tr=0
    // t2: lvl=rnd(20000+3*10000,4)=12500; tr=rnd(2500+0,8)=313
    // t3: lvl=rnd(20000+3*12813,4)=14610 (58439/4=14609.75→14610)
    //     tr=rnd((14610-12500)+7*313,8)=rnd(4301,8)=538 (537.6→538)
    assert(out == Seq(
      (10000L, 10000L, 0L),
      (20000L, 12500L, 313L),
      (20000L, 14610L, 538L)))
  }

  test("holt: constant series converges to level=y, trend=0") {
    val s = (1 to 40).map(i =>
      ("g", Date.valueOf(f"2024-01-${(i % 28) + 1}%02d"), 50000L))
      .zipWithIndex.map { case ((g, _, y), i) =>
        (g, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), y)
      }.toDF("grp", "day", "y4")
    val last = Forecast.holt(s, Seq("grp"), "day", "y4")
      .orderBy("day").select("level4", "trend4")
      .as[(Long, Long)].collect().last
    assert(last == ((50000L, 0L)))
  }

  test("independent groups fold independently") {
    val s = Seq(
      ("a", Date.valueOf("2024-01-01"), 100L),
      ("a", Date.valueOf("2024-01-02"), 200L),
      ("b", Date.valueOf("2024-01-01"), 999L)
    ).toDF("grp", "day", "y4")
    val out = Forecast.holt(s, Seq("grp"), "day", "y4")
      .select("grp", "level4").as[(String, Long)].collect().toMap
    assert(out("b") == 999L) // first observation seeds level directly
  }

  test("driver fold guard: oversized series fails loudly, bounded one runs") {
    val s = (0 until 20).map(i =>
      ("g", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        100L * i)).toDF("grp", "day", "y4")
    val e = intercept[IllegalArgumentException] {
      Forecast.holt(s, Seq("grp"), "day", "y4", driverLimit = 10L)
    }
    assert(e.getMessage.contains("calendar-bounded"), e.getMessage)
    // at the limit exactly: legal
    assert(Forecast.holt(s, Seq("grp"), "day", "y4", driverLimit = 20L)
      .count() == 20L)
  }
}
