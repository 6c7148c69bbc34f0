package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{IntervalStats, RangeJoin}

class IntervalStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // randomized but seeded fixture: bursty users (duplicate eps, tight
  // bursts) over a short axis so windows overlap heavily
  private lazy val points = {
    val rnd = new scala.util.Random(7)
    (1L to 3000L).map { id =>
      val user = rnd.nextInt(40).toLong
      val ep = (rnd.nextInt(50) * 20 + rnd.nextInt(8)).toLong // bursts
      (id, ep, user, 1L, if (id % 5 == 0) 1L else 0L,
        BigDecimal(rnd.nextInt(1000)) / 100)
    }.toDF("id", "ep", "user_id", "n", "np", "v")
      .withColumn("v4", col("v").cast("decimal(18,4)")).drop("v")
  }

  private lazy val windows = {
    val rnd = new scala.util.Random(11)
    // includes windows beyond the data (empty) and zero-length windows
    (1L to 200L).map { wid =>
      val s = (rnd.nextInt(70) * 17).toLong - 50
      (wid, s, s + (if (wid % 7 == 0) 0L else 60L))
    }.toDF("wid", "ws", "we")
  }

  private def naive = RangeJoin
    .pointInInterval(points, windows, "ep", "ws", "we", bucketWidth = 60)
    .groupBy("wid")
    .agg(sum("n").as("n"), sum("np").as("np"),
      sum("v4").as("v4"), countDistinct("user_id").as("u"))

  test("prefixDiff equals the pair join on every subtractive aggregate") {
    val got = IntervalStats.prefixDiff(points, "ep", "id",
      Seq("n", "np", "v4"), windows, "wid", "ws", "we")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDecimal(3))))
      .toMap
    val exp = naive.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDecimal(3)))).toMap
    // pair join drops empty windows; prefixDiff reports exact zeros
    assert(got.size == 200)
    exp.foreach { case (w, e) =>
      val g = got(w)
      assert(g._1 == e._1 && g._2 == e._2, s"window $w: $g != $e")
      assert(g._3.compareTo(e._3) == 0, s"window $w sum: ${g._3} != ${e._3}")
    }
    (got.keySet -- exp.keySet).foreach { w =>
      val g = got(w)
      assert(g._1 == 0L && g._2 == 0L && g._3.signum == 0,
        s"empty window $w must be exact zeros, got $g")
    }
  }

  test("distinctInWindows equals the pair join's countDistinct") {
    // fixed-span windows only (the operator's contract)
    val wins = windows.filter(col("we") === col("ws") + 60)
    val got = IntervalStats.distinctInWindows(points, "ep", "user_id",
      wins, "wid", "ws", span = 60L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = RangeJoin
      .pointInInterval(points, wins, "ep", "ws", "we", bucketWidth = 60)
      .groupBy("wid").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("prefixDiff plans range-partitioned, with no cross join") {
    val p = IntervalStats.prefixDiff(points, "ep", "id", Seq("n"),
      windows, "wid", "ws", "we")
      .queryExecution.executedPlan.toString
    PlanPins.assertRangePrefixed(p, "prefixDiff")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"no pair join allowed:\n$p")
  }

  test("distinctInWindows excludes null keys like COUNT(DISTINCT)") {
    import spark.implicits._
    // window 10: one real key + a null-key event; window 100: ONLY a
    // null-key event (must report no row, not n_distinct = 1)
    val pts = Seq((Some("u1"), 12L), (Option.empty[String], 15L),
      (Option.empty[String], 105L)).toDF("user_id", "ep")
    val wins = Seq((1L, 10L), (2L, 100L)).toDF("wid", "ws")
    val got = IntervalStats.distinctInWindows(pts, "ep", "user_id",
      wins, "wid", "ws", span = 60L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }
}
