package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.MixSources

class MixSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Independent reimplementation of HashSplit.bucket (MessageDigest, not
  // Spark's md5/conv) so membership is checked against a second engine.
  private def jvmBucket(key: Long, buckets: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  private val df = (
    (1L to 800L).map(i => (i, "web")) ++
      (801L to 900L).map(i => (i, "books")) ++
      (901L to 950L).map(i => (i, "junk"))
  ).toDF("doc_id", "source")

  test("binding source survives whole; others downsample toward the ratio") {
    val out = MixSources.mix(df, "doc_id", "source",
      Map("web" -> 1, "books" -> 1))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // T = min(800/1, 100/1) = 100: books is binding → kept whole
    // (target = n means bucket*n < n*B ⟺ bucket < B, always true).
    assert(bySrc("books") == 100L, bySrc)
    // web targets 100 of 800 — hash-uniform, so roughly 1/8
    assert(bySrc("web") > 55 && bySrc("web") < 145, bySrc)
    // unlisted sources are dropped
    assert(!bySrc.contains("junk"), bySrc)
  }

  test("membership matches an independent md5 recomputation, stably") {
    val parts = Map("web" -> 3, "books" -> 2)
    val out = MixSources.mix(df, "doc_id", "source", parts)
    val got = out.collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    // recompute: n_web=800, n_books=100, T=min(800/3, 100/2)=50,
    // targets web=150, books=100
    val counts = Map("web" -> 800L, "books" -> 100L)
    val t = parts.map { case (s, w) => counts(s) / w }.min
    val b = 1000000
    val expect = df.collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter { case (id, src) =>
        parts.contains(src) &&
          jvmBucket(id, b) * counts(src) < parts(src) * t * b.toLong
      }.toSet
    assert(got == expect)
    // reproducible regardless of physical partitioning
    val again = MixSources.mix(df.repartition(13), "doc_id", "source", parts)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(again == got)
  }

  test("a listed-but-absent source makes the mixture unsatisfiable: empty") {
    val out = MixSources.mix(df, "doc_id", "source",
      Map("web" -> 1, "missing" -> 1))
    assert(out.count() == 0L)
  }

  test("invalid parts fail loud") {
    intercept[IllegalArgumentException] {
      MixSources.mix(df, "doc_id", "source", Map.empty)
    }
    intercept[IllegalArgumentException] {
      MixSources.mix(df, "doc_id", "source", Map("web" -> 0))
    }
  }
}
