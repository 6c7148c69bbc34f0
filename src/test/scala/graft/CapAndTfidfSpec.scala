package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.CapPerGroup
import graft.text.TextAnalysis

class CapAndTfidfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cap: at most N per group, membership order-independent") {
    val rows = for (g <- Seq("a", "b"); i <- 1 to 50) yield (g, s"$g-$i")
    val df = rows.toDF("grp", "id")
    val capped = CapPerGroup.cap(df, Seq("grp"), "id", 7)
    val byGroup = capped.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup == Map("a" -> 7L, "b" -> 7L))
    // same rows in reversed order / different partitioning → same kept set
    val kept1 = capped.select("id").collect().map(_.getString(0)).toSet
    val kept2 = CapPerGroup.cap(rows.reverse.toDF("grp", "id").repartition(5),
      Seq("grp"), "id", 7).select("id").collect().map(_.getString(0)).toSet
    assert(kept1 == kept2)
    // a group smaller than the cap survives whole
    val small = CapPerGroup.cap(df.filter(col("id").isin("a-1", "a-2")),
      Seq("grp"), "id", 7)
    assert(small.count() == 2)
  }

  test("cap: plan uses rank-limit pushdown (WindowGroupLimit)") {
    val df = (1 to 100).map(i => (s"g${i % 3}", s"id$i")).toDF("grp", "id")
    val plan = CapPerGroup.cap(df, Seq("grp"), "id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit (map-side top-k per group) in:\n$plan")
  }

  test("tfidf: hand-computed scores and ranks on a tiny corpus") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry date")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    // N=3; df: apple 1, banana 2, cherry 2, date 1
    // idf(df=1)=ln(4/2)=ln2; idf(df=2)=ln(4/3)
    val ln2 = BigDecimal(math.log(2.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val l43 = BigDecimal(math.log(4.0 / 3.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val doc1 = out.filter(_._1 == 1L).sortBy(_._5)
    // doc1: apple tf=2 → 2·ln2 ≈ 1.386; banana tf=1 → ln(4/3) ≈ 0.288
    assert(doc1.map(t => (t._2, t._5)).toSeq == Seq(("apple", 1L), ("banana", 2L)))
    assert(math.abs(doc1(0)._4 - BigDecimal(2 * math.log(2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    val doc3 = out.filter(_._1 == 3L).sortBy(_._5)
    // doc3: cherry tf=2 → 2·ln(4/3) ≈ 0.575 beats date tf=1 → ln2 ≈ 0.693?
    // no: ln2 ≈ 0.693 > 0.575 — date ranks first
    assert(doc3.map(t => (t._2, t._5)).toSeq == Seq(("date", 1L), ("cherry", 2L)))
    assert(math.abs(doc3(0)._4 - ln2) < 1e-12)
    assert(math.abs(doc3(1)._4 - 2 * l43) < 2e-9) // rounded after the product
  }

  test("tfidf: k bounds output per doc; empty docs produce no rows") {
    val docs = Seq((1L, "a b c d e"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, k = 3)
    assert(out.groupBy("doc_id").count().collect()
      .forall(_.getLong(1) <= 3))
    assert(out.filter(col("doc_id") =!= 1L).count() == 0)
  }
}
