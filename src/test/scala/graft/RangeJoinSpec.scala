package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val points = Seq(
    (1L, -301L), (2L, -300L), (3L, -1L), (4L, 0L), (5L, 1L),
    (6L, 150L), (7L, 299L), (8L, 300L), (9L, 301L), (10L, 12345L)
  ).toDF("event_id", "ep")

  private val intervals = Seq(
    (100L, 0L, 300L),     // aligned to two buckets' boundary
    (101L, -300L, -1L),   // entirely negative axis
    (102L, 100L, 120L),   // inside one bucket
    (103L, 250L, 650L),   // spans three buckets at W=300
    (104L, 500L, 400L)    // malformed: end < start — matches nothing
  ).toDF("window_id", "w_start", "w_end")

  private def runWith(w: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(points, intervals, "ep", "w_start", "w_end", w)
      .select("event_id", "window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val naive: Set[(Long, Long)] =
    points.crossJoin(intervals)
      .filter(col("w_start") <= col("ep") && col("ep") <= col("w_end"))
      .select("event_id", "window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches the naive cross-join filter, at several bucket widths") {
    // widths below, at, and above the interval lengths — including W=7,
    // which misaligns every boundary; bucketization must not change the
    // result, only the plan
    Seq(7L, 300L, 1000L, 100000L).foreach { w =>
      assert(runWith(w) == naive, s"bucketWidth=$w")
    }
  }

  test("inclusive bounds, negative axis, malformed intervals") {
    val out = runWith(300L)
    assert(out.contains((4L, 100L)) && out.contains((8L, 100L))) // inclusive ends
    assert(out.contains((2L, 101L)) && out.contains((3L, 101L))) // negative axis
    assert(!out.exists(_._2 == 104L))                            // end < start
    assert(naive.exists(_._2 == 103L) &&
      out.filter(_._2 == 103L) == naive.filter(_._2 == 103L))    // multi-bucket span
  }

  test("no duplicate pairs when an interval spans many buckets") {
    val out = RangeJoin.pointInInterval(
      points, intervals, "ep", "w_start", "w_end", bucketWidth = 7L)
      .select("event_id", "window_id").collect()
    assert(out.length == out.distinct.length)
  }

  test("overlapping column names are rejected") {
    val bad = intervals.withColumnRenamed("w_start", "ep")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, bad, "ep", "ep", "w_end", 300L)
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
