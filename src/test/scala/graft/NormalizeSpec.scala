package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Normalize

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("z-score and min-max per group against hand-computed values") {
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 10.0), (5L, "b", 10.0),
      (6L, "c", 7.0)
    ).toDF("id", "grp", "value")
    val out = Normalize.perGroup(df, Seq("grp"), "value", Seq("id"))
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Double]("value_z")),
          Option(r.getAs[java.lang.Double]("value_minmax")))).toMap
    // group a: mean 2, sample std 1 → z = -1, 0, 1; minmax 0, .5, 1
    assert(out(1L) == ((Some(-1.0), Some(0.0))))
    assert(out(2L) == ((Some(0.0), Some(0.5))))
    assert(out(3L) == ((Some(1.0), Some(1.0))))
    // group b: zero variance → z null; max == min → minmax null
    assert(out(4L) == ((None, None)) && out(5L) == ((None, None)))
    // group c: single row → both null
    assert(out(6L) == ((None, None)))
  }

  test("a null group is a group, not a dropped row") {
    val df = Seq(
      (1L, Option("a"), 1.0), (2L, Option("a"), 3.0),
      (3L, Option.empty[String], 1.0), (4L, Option.empty[String], 3.0)
    ).toDF("id", "grp", "value")
    val out = Normalize.perGroup(df, Seq("grp"), "value", Seq("id"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("value_z"))).toMap
    assert(out.size == 4)
    // the null group normalizes within itself, same stats as group a
    assert(out(3L) == out(1L) && out(4L) == out(2L))
  }

  test("null values are excluded from moments, not zero-filled") {
    val df = Seq(
      (1L, "a", Some(1.0)), (2L, "a", Some(3.0)), (3L, "a", None)
    ).toDF("id", "grp", "value")
    val out = Normalize.perGroup(df, Seq("grp"), "value", Seq("id"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("value_z"))).toMap
    // n = 2 (null excluded): mean 2, std sqrt(2) → z = ∓0.707106781
    assert(out(1L) == Some(-0.707106781))
    assert(out(2L) == Some(0.707106781))
    assert(out(3L).isEmpty)
  }
}
