package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventOps

class SessionPathsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("paths: session boundary resets the chain; __START__ marks entries") {
    val rows = Seq(
      // session 1 of user 1: view → click → purchase
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, ""),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 0.0, ""),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase", 0.0, ""),
      // > 30 min gap → session 2: view → view (NOT purchase → view)
      (4L, ts("2024-01-01 11:00:00"), 1L, "view", 0.0, ""),
      (5L, ts("2024-01-01 11:05:00"), 1L, "view", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.sessionPaths(rows)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out(("__START__", "view")) == 2L) // both sessions enter on view
    assert(out(("view", "click")) == 1L)
    assert(out(("click", "purchase")) == 1L)
    assert(out(("view", "view")) == 1L)
    // the cross-session edge must NOT exist
    assert(!out.contains(("purchase", "view")))
  }

  test("paths: next-step probabilities sum to 1 per from_type") {
    val rnd = new scala.util.Random(31)
    val types = Seq("view", "click", "purchase")
    val rows = (1 to 300).map { i =>
      (i.toLong, ts(f"2024-01-01 ${10 + i / 250}%02d:${(i / 10) % 60}%02d:${i % 60}%02d"),
        (i % 7).toLong, types(rnd.nextInt(3)), 0.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sums = EventOps.sessionPaths(rows)
      .groupBy("from_type")
      .agg(sum(col("p_next")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    sums.foreach { case (f, s) =>
      assert(math.abs(s - 1.0) < 1e-6, s"$f sums to $s")
    }
  }

  test("selfJoinCardinality: uniform keys hit the n²/k ideal exactly") {
    val df = (1 to 100).map(i => (i % 10, i)).toDF("k", "v")
    val r = graft.ops.KeySkew.selfJoinCardinality(df, Seq("k")).head()
    assert(r.getAs[Long]("self_join_pairs") == 1000L) // 10 keys × 10²
    assert(r.getAs[Long]("uniform_pairs") == 1000L)
    assert(r.getAs[Double]("amplification") == 1.0)
  }

  test("selfJoinCardinality: skew amplifies above the uniform ideal") {
    // 91 rows on one key + 9 singletons: Σf² = 8281 + 9 = 8290
    val df = ((1 to 91).map(_ => 0) ++ (1 to 9)).map(k => (k, 1))
      .toDF("k", "v")
    val r = graft.ops.KeySkew.selfJoinCardinality(df, Seq("k")).head()
    assert(r.getAs[Long]("self_join_pairs") == 8290L)
    assert(r.getAs[Long]("uniform_pairs") == 1000L) // 100² / 10
    assert(r.getAs[Double]("amplification") > 8.0)
  }
}
