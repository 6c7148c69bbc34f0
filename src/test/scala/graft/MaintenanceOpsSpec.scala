package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Compaction, Ivm, SkewJoin}

/** Round-6 maintenance/skew operators: salted join, incremental view
  * maintenance, compaction planning, and the PERMISSIVE-JSON quarantine
  * semantics the `events_json_quarantine` entry relies on.
  */
class MaintenanceOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- SkewJoin -----------------------------------------------------------

  private val probe = Seq(
    (1, "a", 10.0), (1, "b", 20.0), (1, "c", 30.0), // hot key
    (2, "d", 40.0), (3, "e", 50.0), (9, "x", 60.0)  // 9 has no dim row
  ).toDF("k", "tag", "v")
  private val dim = Seq((1, "one"), (2, "two"), (3, "three"), (4, "four"))
    .toDF("k", "name")

  test("salted inner join ≡ plain inner join, any salt") {
    val plain = probe.join(dim, Seq("k"))
      .select("k", "tag", "v", "name").collect().toSet
    for (salt <- Seq(1, 3, 8)) {
      val salted = SkewJoin.saltedInner(probe, dim, Seq("k"), salt)
        .select("k", "tag", "v", "name").collect().toSet
      assert(salted == plain, s"salt=$salt")
    }
  }

  test("salted join: duplicate probe rows keep their multiplicity") {
    val dup = probe.unionAll(probe)
    val plain = dup.join(dim, Seq("k")).count()
    assert(SkewJoin.saltedInner(dup, dim, Seq("k"), 4).count() == plain)
  }

  // --- Ivm ----------------------------------------------------------------

  private val fact = Seq(
    ("h1", java.sql.Date.valueOf("2024-01-01"), 10.5),
    ("h1", java.sql.Date.valueOf("2024-01-05"), 2.25),
    ("h1", java.sql.Date.valueOf("2024-02-01"), 7.0),
    ("h2", java.sql.Date.valueOf("2024-01-03"), 100.0)
  ).toDF("hh", "day", "amt")

  test("ivm: merge of any split ≡ full partials, finished values exact") {
    val full = Ivm.finish(
      Ivm.partials(fact, Seq("hh"), "amt", "day")).collect()
      .map(r => r.getString(0) -> r).toMap
    // split by month, merge back
    val jan = fact.filter(col("day") < lit("2024-02-01"))
    val feb = fact.filter(col("day") >= lit("2024-02-01"))
    val merged = Ivm.finish(Ivm.merge(
      Ivm.partials(jan, Seq("hh"), "amt", "day"),
      Ivm.partials(feb, Seq("hh"), "amt", "day"))).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(merged.keySet == full.keySet)
    for (k <- full.keySet) {
      assert(merged(k).getLong(1) == full(k).getLong(1))       // n_rows
      assert(merged(k).getDouble(2) == full(k).getDouble(2))   // total
      assert(merged(k).getDouble(3) == full(k).getDouble(3))   // avg
      assert(merged(k).getDate(4) == full(k).getDate(4))       // first
      assert(merged(k).getDate(5) == full(k).getDate(5))       // last
    }
    val h1 = merged("h1")
    assert(h1.getLong(1) == 3L && h1.getDouble(2) == 19.75)
  }

  test("ivm: merge is order/arity independent (monoid)") {
    val parts = Seq("2024-01-02", "2024-01-04", "2024-03-01").map { cut =>
      Ivm.partials(fact.filter(col("day") <= lit(cut)), Seq("hh"), "amt", "day")
    }
    // three overlapping frames would double-count — use disjoint slices
    val s1 = Ivm.partials(fact.filter(col("day") <= lit("2024-01-02")),
      Seq("hh"), "amt", "day")
    val s2 = Ivm.partials(fact.filter(
      col("day") > lit("2024-01-02") && col("day") <= lit("2024-01-04")),
      Seq("hh"), "amt", "day")
    val s3 = Ivm.partials(fact.filter(col("day") > lit("2024-01-04")),
      Seq("hh"), "amt", "day")
    val a = Ivm.finish(Ivm.merge(s1, s2, s3)).collect().map(_.toSeq).toSet
    val b = Ivm.finish(Ivm.merge(s3, s1, s2)).collect().map(_.toSeq).toSet
    val direct = Ivm.finish(Ivm.partials(fact, Seq("hh"), "amt", "day"))
      .collect().map(_.toSeq).toSet
    assert(a == direct && b == direct)
    assert(parts.nonEmpty) // silence unused warning
  }

  // --- Compaction ---------------------------------------------------------

  private val manifest = Seq(
    // (file day-order key, bytes, shard) — shard order-aligned with key
    (1, 40L, 0), (2, 40L, 0), (3, 40L, 0),
    (4, 100L, 1), (5, 10L, 1), (6, 10L, 1), (7, 200L, 2)
  ).toDF("fid", "bytes", "shard")

  test("compaction: next-fit assignment matches the exact running total") {
    val got = Compaction.plan(manifest, "fid", "bytes", "shard", 100L)
      .orderBy("fid")
      .select("fid", "cum_before", "out_file").as[(Int, Long, Long)]
      .collect()
    // cum_before: 0,40,80,120,220,230,240 → bins 0,0,0,1,2,2,2
    assert(got.toSeq == Seq(
      (1, 0L, 0L), (2, 40L, 0L), (3, 80L, 0L),
      (4, 120L, 1L), (5, 220L, 2L), (6, 230L, 2L), (7, 240L, 2L)))
  }

  test("compaction: shard granularity does not change the plan") {
    val fine = Compaction.plan(manifest, "fid", "bytes", "shard", 100L)
      .select("fid", "out_file").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val coarse = Compaction.plan(manifest.withColumn("one", lit(0)),
      "fid", "bytes", "one", 100L)
      .select("fid", "out_file").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fine == coarse)
  }

  test("compaction: every output bin < target + max input bytes") {
    val target = 100L
    val binBytes = Compaction.plan(manifest, "fid", "bytes", "shard", target)
      .groupBy("out_file").agg(sum("bytes").as("b"))
      .select("b").as[Long].collect()
    val maxIn = 200L
    assert(binBytes.forall(_ < target + maxIn))
  }

  // --- PERMISSIVE JSON quarantine semantics -------------------------------

  test("from_json: corrupt payload surfaces as null field, valid parses") {
    val df = Seq("""{"k": 7}""", """{{"k": 7}""", null)
      .toDF("raw")
      .withColumn("k", from_json(col("raw"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
        .getField("k"))
    val got = df.select("k").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(7L), None, None))
  }
}
