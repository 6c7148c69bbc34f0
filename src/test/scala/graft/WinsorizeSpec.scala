package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Winsorize

class WinsorizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clips to interpolated cuts, passes the interior through untouched") {
    val df = (1 to 10).map(i => (i.toLong, "a", i.toDouble))
      .toDF("id", "grp", "value")
    val out = Winsorize.perGroup(df, Seq("grp"), "value", Seq("id"),
      lo = 0.1, hi = 0.9)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("value_clipped"),
          r.getAs[Boolean]("clipped_low"), r.getAs[Boolean]("clipped_high")))
      .toMap
    // n = 10: p10 sits at rank 0.9 → 1.9; p90 at rank 8.1 → 9.1
    assert(out(1L) == ((1.9, true, false)))
    assert(out(10L) == ((9.1, false, true)))
    (2L to 9L).foreach(i => assert(out(i) == ((i.toDouble, false, false))))
  }

  test("null values and all-null groups pass through with null flags") {
    val df = Seq(
      (1L, "a", Option(1.0)), (2L, "a", Option(2.0)), (3L, "a", Option(3.0)),
      (4L, "a", Option.empty[Double]),
      (5L, "b", Option.empty[Double])
    ).toDF("id", "grp", "value")
    val out = Winsorize.perGroup(df, Seq("grp"), "value", Seq("id"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.size == 5)
    assert(out(4L).isNullAt(out(4L).fieldIndex("value_clipped")))
    assert(out(4L).isNullAt(out(4L).fieldIndex("clipped_low")))
    assert(out(5L).isNullAt(out(5L).fieldIndex("value_clipped")))
  }
}
