package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.train.AsOfLookup

class AsOfLookupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private val snapshots = Seq(
    (1L, d("2024-01-01"), 10.0),
    (1L, d("2024-01-15"), 20.0),
    (2L, d("2024-02-01"), 99.0) // only a FUTURE snapshot for the early spine
  ).toDF("household_key", "day", "m")

  test("as-of picks the latest snapshot <= spine day") {
    val spine = Seq(
      (1L, d("2024-01-10")), // between snapshots → 01-01
      (1L, d("2024-01-15")), // exact hit → 01-15
      (1L, d("2024-03-01"))  // after both → 01-15
    ).toDF("household_key", "day")
    val out = AsOfLookup.lookupAsOf(spine, snapshots, Seq("household_key"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[java.sql.Date]("snapshot_day").toString, r.getAs[Double]("m"))).toMap
    assert(out("2024-01-10") == (("2024-01-01", 10.0)))
    assert(out("2024-01-15") == (("2024-01-15", 20.0)))
    assert(out("2024-03-01") == (("2024-01-15", 20.0)))
  }

  test("spine rows with no preceding snapshot survive with nulls") {
    val spine = Seq((2L, d("2024-01-10"))).toDF("household_key", "day")
    val out = AsOfLookup.lookupAsOf(spine, snapshots, Seq("household_key")).head()
    assert(out.isNullAt(out.fieldIndex("snapshot_day")))
    assert(out.isNullAt(out.fieldIndex("m")))
  }

  test("exactly one row per spine row (no fan-out leaks)") {
    val spine = Seq((1L, d("2024-06-01")), (2L, d("2024-06-01")))
      .toDF("household_key", "day")
    assert(AsOfLookup.lookupAsOf(spine, snapshots, Seq("household_key")).count() == 2)
  }

  test("duplicate spine rows each survive independently (ASOF semantics)") {
    // two spine rows with the SAME (key, day) but distinct payloads —
    // each must get its own as-of match, not collapse to one survivor
    val spine = Seq(
      (1L, d("2024-01-10"), "A"),
      (1L, d("2024-01-10"), "B"),
      (1L, d("2024-02-01"), "C")
    ).toDF("household_key", "day", "tag")
    val out = AsOfLookup.lookupAsOf(spine, snapshots, Seq("household_key"))
    assert(out.count() == 3)
    val byTag = out.collect().map(r => r.getAs[String]("tag") ->
      r.getAs[Double]("m")).toMap
    assert(byTag("A") == 10.0 && byTag("B") == 10.0 && byTag("C") == 20.0)
  }

  test("multiplicity re-expansion is exact across chunk boundaries") {
    // 7 identical rows with expandChunk = 3 exercises every chunk shape:
    // two full chunks (3 + 3) plus a 1-element remainder — and the
    // single-chunk case (5 rows, chunk 8) must be untouched by the split
    val spine7 = spark.range(7).select(lit(1L).as("household_key"),
      lit(d("2024-01-10")).as("day"))
    val out7 = AsOfLookup.lookupAsOf(spine7, snapshots, Seq("household_key"),
      expandChunk = 3L).collect()
    assert(out7.length == 7)
    assert(out7.forall(_.getAs[Double]("m") == 10.0))
    val spine5 = spark.range(5).select(lit(2L).as("household_key"),
      lit(d("2024-01-10")).as("day"))
    val out5 = AsOfLookup.lookupAsOf(spine5, snapshots, Seq("household_key"),
      expandChunk = 8L).collect()
    assert(out5.length == 5)
    assert(out5.forall(r => r.isNullAt(r.fieldIndex("m"))))
  }

  test("bit-identical duplicate spine rows keep their multiplicity") {
    val spine = Seq(
      (1L, d("2024-01-10")), (1L, d("2024-01-10")), (1L, d("2024-01-10")),
      (2L, d("2024-01-10")), (2L, d("2024-01-10")) // unmatched, null m
    ).toDF("household_key", "day")
    val out = AsOfLookup.lookupAsOf(spine, snapshots, Seq("household_key"))
      .collect()
    assert(out.length == 5)
    assert(out.count(r => r.getAs[Long]("household_key") == 1L &&
      r.getAs[Double]("m") == 10.0) == 3)
    assert(out.count(r => r.getAs[Long]("household_key") == 2L &&
      r.isNullAt(r.fieldIndex("m"))) == 2)
  }

  test("maxStalenessDays: past-tolerance matches come back null") {
    val spine = Seq(
      (1L, d("2024-01-20")), // latest = 01-15, 5 days old → within 10
      (1L, d("2024-01-30")), // latest = 01-15, 15 days old → REJECTED
      (1L, d("2024-01-15"))  // exact day, 0 days old → fine at tol 0 too
    ).toDF("household_key", "day")
    val out = AsOfLookup.lookupAsOf(spine, snapshots, Seq("household_key"),
      maxStalenessDays = Some(10))
      .collect().map { r =>
        r.getAs[java.sql.Date]("day").toString ->
          (if (r.isNullAt(r.fieldIndex("m"))) None else Some(r.getAs[Double]("m")))
      }.toMap
    assert(out("2024-01-20") == Some(20.0))
    assert(out("2024-01-30") == None) // stale → null, row survives
    assert(out("2024-01-15") == Some(20.0))
    // tolerance 0: only an exact-day snapshot qualifies
    val strict = AsOfLookup.lookupAsOf(spine, snapshots, Seq("household_key"),
      maxStalenessDays = Some(0))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.isNullAt(r.fieldIndex("m"))).toMap
    assert(strict == Map("2024-01-20" -> true, "2024-01-30" -> true,
      "2024-01-15" -> false))
  }
}
