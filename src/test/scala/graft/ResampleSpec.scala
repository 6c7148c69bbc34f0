package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Resample

class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Same independent md5 reimplementation as MixSourcesSpec: multiplicity
  // is checked against a second engine, not Spark against itself.
  private def jvmBucket(key: Long, buckets: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  private val df = (
    (1L to 400L).map(i => (i, "a")) ++
      (401L to 600L).map(i => (i, "b")) ++
      (601L to 700L).map(i => (i, "c")) ++
      (701L to 750L).map(i => (i, "drop_me"))
  ).toDF("doc_id", "source")

  test("per-row multiplicity is floor(f) or ceil(f), hash-decided") {
    val factors = Map("a" -> 2500000L, "b" -> 1000000L, "c" -> 400000L)
    val out = Resample.byFactors(df, "source", "doc_id", factors)
    val byDoc = out.groupBy("doc_id", "source").agg(
      count(lit(1)).as("n"), max("copy_idx").as("mx")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(!byDoc.exists(_._2 == "drop_me"))
    byDoc.foreach { case (id, src, n, mx) =>
      assert(mx == n, s"copy_idx must be dense 1..n for doc $id")
      val ppm = factors(src)
      val expected = ppm / 1000000L +
        (if (jvmBucket(id, 1000000) * 1000000L < (ppm % 1000000L) * 1000000L) 1L else 0L)
      assert(n == expected, s"doc $id ($src)")
    }
    // ×1.0 is exactly one copy per row — no hash involvement
    assert(byDoc.filter(_._2 == "b").forall(_._3 == 1L))
  }

  test("aggregate sizes land near n·f and are reproducible") {
    val factors = Map("a" -> 1750000L, "c" -> 2000000L)
    val out = Resample.byFactors(df, "source", "doc_id", factors)
    val sizes = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes("c") == 200L) // exact: ×2.0 has no fractional part
    assert(sizes("a") > 400L * 1.6 && sizes("a") < 400L * 1.9)
    val again = Resample.byFactors(df, "source", "doc_id", factors)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == sizes)
  }

  test("zero factor drops the source; zero-copy rows do not explode") {
    val out = Resample.byFactors(df, "source", "doc_id",
      Map("a" -> 0L, "b" -> 500000L))
    val srcs = out.select("source").distinct().collect().map(_.getString(0)).toSet
    assert(srcs == Set("b"))
    val n = out.count()
    assert(n > 0 && n < 200) // ~half of b's 200 rows
  }

  test("null keys keep whole copies only") {
    val d = Seq((Some(1L), "a"), (None, "a")).toDF("doc_id", "source")
    val out = Resample.byFactors(d, "source", "doc_id", Map("a" -> 2900000L))
    val nullCopies = out.filter(col("doc_id").isNull).count()
    assert(nullCopies == 2L) // floor(2.9), fractional test null → no extra
  }
}
