package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Expectations
import graft.ops.Expectations._
import graft.ops.SnapshotDiff

class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), 10.0), (2L, Some("b"), -1.0),
    (3L, None, 5.0), (3L, Some("d"), 7.0))
    .toDF("id", "tag", "v")

  test("report evaluates every check with band verdicts") {
    val rep = Expectations.report(df, Seq(
      Expectations.size(3),             // 4 rows >= 3 → pass
      completeness("tag", 1.0),         // 3/4 < 1.0 → fail
      uniqueness(Seq("id"), 0.9),       // 3/4 < 0.9 → fail
      minOf("v", 0.0),                  // -1 < 0 → fail
      maxOf("v", 10.0)))                // 10 <= 10 → pass
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(4)))
      .toMap
    assert(rep("size") == ((4.0, true)))
    assert(rep("completeness(tag)") == ((0.75, false)))
    assert(rep("uniqueness(id)") == ((0.75, false)))
    assert(rep("min(v)") == ((-1.0, false)))
    assert(rep("max(v)") == ((10.0, true)))
  }

  test("a null observation fails its check") {
    val empty = df.filter(lit(false))
    val rep = Expectations.report(empty, Seq(minOf("v", 0.0)))
      .collect()
    assert(rep.length == 1 && rep.head.isNullAt(1) && !rep.head.getBoolean(4))
  }

  test("check names with quotes are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.report(df, Seq(Check("bad'name", count(lit(1)))))
    }
  }

  test("snapshot diff statuses on a hand-checked key set") {
    // k=1: both, equal → unchanged; k=2: A only → removed;
    // k=3: B only → added; k=4: both, different sums → changed
    val ev = Seq(
      (1L, "a", 5.0), (1L, "b", 5.0),
      (2L, "a", 1.0),
      (3L, "b", 2.0),
      (4L, "a", 3.0), (4L, "b", 4.0))
      .toDF("k", "side", "v")
    val got = SnapshotDiff.diff(ev, Seq("k"), col("v"),
      col("side") === "a", col("side") === "b")
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "removed",
      3L -> "added", 4L -> "changed"))
  }

  test("snapshot diff flags equal sums with different counts as changed") {
    val ev = Seq((1L, "a", 6.0), (1L, "b", 3.0), (1L, "b", 3.0))
      .toDF("k", "side", "v")
    val got = SnapshotDiff.diff(ev, Seq("k"), col("v"),
      col("side") === "a", col("side") === "b").collect()
    assert(got.head.getString(5) == "changed")
  }
}
