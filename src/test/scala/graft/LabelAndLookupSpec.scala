package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.labels.LabelBuilder
import graft.train.TrainingSetBuilder

class LabelAndLookupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("labels: positives in horizon, negatives coalesced to 0, day stamped") {
    val fed = LocalDate.parse("2024-06-30")
    val txc = Seq(
      (1L, d("2024-07-05"), "A"),  // in horizon → positive
      (1L, d("2024-06-01"), "B"),  // before cutoff → not a positive
      (2L, d("2024-08-15"), "A")   // after horizon → not a positive
    ).toDF("household_key", "day", "commodity_desc")
    val cts = Seq("A", "B").toDF("commodity_desc")
    val out = LabelBuilder.labels(txc, cts, fed)
      .collect()
      .map(r => (r.getAs[Long]("household_key"), r.getAs[String]("commodity_desc")) ->
        (r.getAs[Int]("purchased"), r.getAs[java.sql.Date]("day"))).toMap
    assert(out.size == 4) // 2 households × 2 commodities
    assert(out((1L, "A"))._1 == 1)
    assert(out((1L, "B"))._1 == 0)
    assert(out((2L, "A"))._1 == 0)
    assert(out.values.forall(_._2 == d("2024-06-30")))
  }

  test("posRatio: window sum yields per-commodity totals and ratios") {
    val labels = Seq(
      (1L, "A", 1), (2L, "A", 0), (3L, "A", 0), (4L, "A", 0),
      (1L, "B", 1), (2L, "B", 1)
    ).toDF("household_key", "commodity_desc", "purchased")
    val out = LabelBuilder.posRatio(labels).collect()
      .map(r => (r.getAs[String]("commodity_desc"), r.getAs[Int]("purchased")) ->
        (r.getAs[Long]("class_rows"), r.getAs[Long]("commodity_rows"),
          r.getAs[Double]("class_ratio"))).toMap
    assert(out(("A", 1)) == ((1L, 4L, 0.25)))
    assert(out(("A", 0)) == ((3L, 4L, 0.75)))
    assert(out(("B", 1)) == ((2L, 2L, 1.0)))
  }

  test("PIT lookup: prefixes applied, exclude dropped, missing filled 0.0") {
    val spine = Seq((1L, d("2024-01-01")), (2L, d("2024-01-01")))
      .toDF("household_key", "day")
    val features = Seq((1L, d("2024-01-01"), 7.0, 99.0))
      .toDF("household_key", "day", "m1", "secret")
    val out = TrainingSetBuilder.build(spine, Seq(
      TrainingSetBuilder.Lookup(features, Seq("household_key"), "household__",
        exclude = Seq("secret"))))
    assert(out.columns.toSet == Set("household_key", "day", "household__m1"))
    val m = out.collect().map(r =>
      r.getAs[Long]("household_key") -> r.getAs[Double]("household__m1")).toMap
    assert(m(1L) == 7.0)
    assert(m(2L) == 0.0) // left-outer miss → fillna
  }

  test("buildMaterialized ≡ build (checkpointed assembly, broadcast hint)") {
    val spine = Seq((1L, "A"), (1L, "B"), (2L, "A"))
      .toDF("household_key", "commodity_desc")
    val hh = Seq((1L, 3.0)).toDF("household_key", "m1")
    val cm = Seq(("A", 5.0)).toDF("commodity_desc", "m2")
    val lks = Seq(
      TrainingSetBuilder.Lookup(hh, Seq("household_key"), "household__"),
      TrainingSetBuilder.Lookup(cm, Seq("commodity_desc"), "commodity__",
        broadcastable = true))
    val plain = TrainingSetBuilder.build(spine, lks, joinDay = false)
    val mat = TrainingSetBuilder.buildMaterialized(spine, lks, joinDay = false)
    assert(mat.columns.toSeq == plain.columns.toSeq)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("household_key"), r.getAs[String]("commodity_desc"))
    assert(mat.collect().map(r => key(r) -> r.toSeq).toMap ==
      plain.collect().map(r => key(r) -> r.toSeq).toMap)
  }

  test("PIT lookup is day-exact: wrong-day snapshot does not match") {
    val spine = Seq((1L, d("2024-01-02"))).toDF("household_key", "day")
    val features = Seq((1L, d("2024-01-01"), 7.0)).toDF("household_key", "day", "m1")
    val out = TrainingSetBuilder.build(spine, Seq(
      TrainingSetBuilder.Lookup(features, Seq("household_key"), "f__")))
    assert(out.select("f__m1").as[Double].head() == 0.0)
  }
}
