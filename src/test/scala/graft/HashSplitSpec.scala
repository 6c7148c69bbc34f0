package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.HashSplit

class HashSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucket is a pure function of the key: known value, order-independent") {
    // md5("42") = a1d0c6e8... → 0xa1d0c6e8 = 2714814184 → % 1000 = 184
    val one = Seq(42L).toDF("k")
      .select(HashSplit.bucket(col("k"), 1000).as("b")).head().getLong(0)
    assert(one == 184L)
    // same keys in different row orders and partitioning → same buckets
    val a = (1L to 500L).toDF("k").repartition(7)
    val b = (1L to 500L).reverse.toDF("k").repartition(3)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), HashSplit.bucket(col("k"), 1000).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(a) == m(b))
  }

  test("split boundaries: labels match buckets, fractions roughly honored") {
    val df = HashSplit.split((1L to 2000L).toDF("doc_id"), "doc_id")
    val byLabel = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 buckets are uniform-ish: train ≈ 80%, val/test ≈ 10% each
    assert(byLabel("train") > 1400 && byLabel("train") < 1800, byLabel)
    assert(byLabel("val") > 100 && byLabel("val") < 320, byLabel)
    assert(byLabel("test") > 100 && byLabel("test") < 320, byLabel)
    // label is consistent with the bucket on every row
    val bad = df.filter(
      (col("bucket") < 800 && col("split") =!= "train") ||
        (col("bucket") >= 800 && col("bucket") < 900 && col("split") =!= "val") ||
        (col("bucket") >= 900 && col("split") =!= "test")).count()
    assert(bad == 0)
  }

  test("split fails loud on a null key instead of leaking rows into 'test'") {
    val df = Seq(Some(1L), None).toDF("doc_id")
    val ex = intercept[Exception] {
      HashSplit.split(df, "doc_id").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("null doc_id")), ex.toString)
  }

  test("stratified: per-class keep rates, absent classes keep default") {
    val df = (1L to 1000L).map(i => (i, if (i <= 800) "big" else "small"))
      .toDF("doc_id", "cls")
    val kept = HashSplit.stratified(df, "doc_id", "cls", Map("big" -> 250))
    val byCls = kept.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // majority capped to ~25%, minority untouched
    assert(byCls("small") == 200L, byCls)
    assert(byCls("big") > 140 && byCls("big") < 260, byCls)
    // membership is the bucket rule exactly
    val expectBig = df.filter(col("cls") === "big")
      .select(col("doc_id"), HashSplit.bucket(col("doc_id"), 1000).as("b"))
      .collect().filter(_.getLong(1) < 250).map(_.getLong(0)).toSet
    val gotBig = kept.filter(col("cls") === "big")
      .collect().map(_.getLong(0)).toSet
    assert(gotBig == expectBig)
  }

  test("downsample keeps exactly the below-threshold buckets, stably") {
    val df = (1L to 1000L).toDF("doc_id")
    val kept = HashSplit.downsample(df, "doc_id", keepPerMille = 100)
    val ids1 = kept.collect().map(_.getLong(0)).toSet
    val ids2 = HashSplit.downsample(df.repartition(13), "doc_id", 100)
      .collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2) // reproducible regardless of partitioning
    assert(ids1.size > 50 && ids1.size < 200)
    // membership really is bucket < threshold
    val check = df.select(col("doc_id"),
      HashSplit.bucket(col("doc_id"), 1000).as("b")).collect()
      .filter(_.getLong(1) < 100).map(_.getLong(0)).toSet
    assert(ids1 == check)
  }
}
