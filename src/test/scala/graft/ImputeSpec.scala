package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Impute

class ImputeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (1L, "a", Some(10.0), Some("x")),
    (2L, "a", Some(20.0), Some("y")),
    (3L, "a", None, Some("x")),
    (4L, "b", None, None),          // group b entirely null → global fallback
    (5L, "b", None, None),
    (6L, "c", Some(7.5), Some("z"))
  ).toDF("id", "grp", "num", "cat")

  test("group mean imputes numeric nulls; all-null group falls back global") {
    val out = Impute.meanMode(df, Seq("grp"), "num", "cat")
      .select("id", "num", "num_imputed")
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(3L) == ((3L, 15.0, true)))      // mean of group a
    assert(out(1L) == ((1L, 10.0, false)))     // untouched
    assert(out(4L)._2 == 12.5)                  // global mean (10+20+7.5)/3
    assert(out(4L)._3)
  }

  test("mode imputes categorical with deterministic value tiebreak") {
    val out = Impute.meanMode(df, Seq("grp"), "num", "cat")
      .select("id", "cat", "cat_imputed")
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> r).toMap
    // group b all null → global mode: x appears 2×, others 1× → "x"
    assert(out(4L) == ((4L, "x", true)))
    assert(out(6L) == ((6L, "z", false)))
  }

  test("tie on counts resolves to the smaller value") {
    val t = Seq(("g", "b"), ("g", "a"), ("g", "b"), ("g", "a"))
      .toDF("grp", "v")
    val m = Impute.groupModes(t, Seq("grp"), "v").collect()
    assert(m.head.getString(1) == "a")
  }

  test("imputation preserves row count and non-null cells") {
    val out = Impute.meanMode(df, Seq("grp"), "num", "cat")
    assert(out.count() == 6)
    assert(out.filter(col("num").isNull || col("cat").isNull).count() == 0)
  }
}
