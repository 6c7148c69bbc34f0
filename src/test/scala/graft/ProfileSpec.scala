package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Profile
import graft.text.Curation

class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile: counts, nulls, typed min/max per column") {
    val df = Seq(
      (1L, Some(2.5), Some("b")),
      (2L, None, Some("a")),
      (3L, Some(-1.0), None)).toDF("id", "x", "s")
    val p = Profile.table(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "x", "s"))
    val id = p("id")
    assert(id.getLong(1) == 3L && id.getLong(2) == 0L) // n_rows, n_nulls
    assert(id.getDouble(3) == 1.0 && id.getDouble(4) == 3.0)
    assert(id.isNullAt(5) && id.isNullAt(6)) // numeric → no string min/max
    val x = p("x")
    assert(x.getLong(2) == 1L && x.getDouble(3) == -1.0 && x.getDouble(4) == 2.5)
    val s = p("s")
    assert(s.getLong(2) == 1L && s.isNullAt(3) && s.isNullAt(4))
    assert(s.getString(5) == "a" && s.getString(6) == "b")
  }

  test("profile: approxDistinct appends exact-ish cardinalities") {
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "m")
    val p = Profile.table(df, approxDistinct = true).collect()
      .map(r => r.getString(0) -> r.getLong(7)).toMap
    // HLL is exact at tiny cardinalities, ±5% at 100
    assert(p("m") == 7L)
    assert(math.abs(p("id") - 100L) <= 5L, s"n_distinct(id) = ${p("id")}")
  }

  test("profile: one aggregation job, no shuffle of data rows") {
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val plan = Profile.table(df).queryExecution.executedPlan.toString
    // a single partial+final aggregate pair; no Exchange of the table rows
    // beyond the 1-row partials
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"grand aggregate should exchange 1-row partials, not hash-partition:\n$plan")
  }

  test("table_profile oracle column list matches the fixture schema") {
    val li = graft.core.Catalog.table(spark, "/root/testdata/sf0.001", "lineitem")
    val live = li.schema.fields.map(f =>
      f.name -> f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]).toSeq
    assert(live == graft.queriesdef.ProfileOracle.lineitemCols,
      "fixture lineitem schema drifted from the hard-coded oracle list")
  }

  test("qualityTopShare: keeps the top share per group, deterministically") {
    // 4 docs per lang: stopword ratios 1.0, 0.5, 0.0, 0.0 (tie on doc_id)
    val docs = Seq(
      (1L, "en", "the a"), (2L, "en", "the x"), (3L, "en", "x y"), (4L, "en", "z w"),
      (5L, "fr", "the a"), (6L, "fr", "q r")).toDF("doc_id", "lang", "text")
    val kept = Curation.qualityTopShare(docs, share = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // en: ranks 1..4 → pr 0, 1/3, 2/3, 1 → keep pr<=0.5 → docs 1,2
    // fr: pr 0, 1 → keep doc 5
    assert(kept == Set(1L, 2L, 5L))
    // order/partitioning independence
    val kept2 = Curation.qualityTopShare(docs.repartition(5), share = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == kept)
  }

  test("qualityAboveCutoff: quantile gate keeps the same top docs here") {
    val docs = Seq(
      (1L, "en", "the a"), (2L, "en", "the x"), (3L, "en", "x y"), (4L, "en", "z w"),
      (5L, "fr", "the a"), (6L, "fr", "q r")).toDF("doc_id", "lang", "text")
    val out = Curation.qualityAboveCutoff(docs, share = 0.5).collect()
    // en cutoff = interp([0, 0, 0.5, 1], 0.5) = 0.25 → docs 1, 2
    // fr cutoff = interp([0, 1], 0.5) = 0.5 → doc 5
    assert(out.map(r => r.getLong(0)).toSet == Set(1L, 2L, 5L))
    val en = out.filter(_.getString(1) == "en").head
    assert(en.getDouble(3) == 0.25) // the interpolated cutoff rides along
  }

  test("qualityAboveCutoff: null group keys form their own group, not dropped") {
    val docs = Seq(
      (1L, null: String, "the a"), (2L, null: String, "x y"),
      (3L, "en", "the a")).toDF("doc_id", "lang", "text")
    val kept = Curation.qualityAboveCutoff(docs, share = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // null-lang group: scores [0, 1], cutoff 0.5 → doc 1 kept; en: doc 3
    assert(kept == Set(1L, 3L))
  }

  test("cap: null keys rank last (the NULLS LAST pin), so they are cut first") {
    import graft.ops.CapPerGroup
    val df = (Seq(("g", null: String)) ++ (1 to 5).map(i => ("g", s"k$i")))
      .toDF("grp", "id")
    val kept = CapPerGroup.cap(df, Seq("grp"), "id", 5)
      .select("id").collect().map(r => Option(r.getString(0)))
    assert(kept.length == 5 && !kept.contains(None))
  }
}
