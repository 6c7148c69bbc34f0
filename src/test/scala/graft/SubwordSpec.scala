package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.text.Subword

class SubwordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bpePairCounts: hand-computed weights, overlaps counted") {
    // corpus: "aaa bb" ×2, "ab" ×1
    // vocab: aaa(2), bb(2), ab(1)
    // aaa → pairs aa,aa (overlap); bb → bb; ab → ab
    val docs = Seq((1L, "aaa bb"), (2L, "aaa bb"), (3L, "ab"))
      .toDF("doc_id", "text")
    val out = Subword.bpePairCounts(docs, k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("aa") == ((1L, 4L))) // 1 word, 2 occurrences × freq 2
    assert(out("bb") == ((1L, 2L)))
    assert(out("ab") == ((1L, 1L)))
  }

  test("bpePairCounts: k caps by weight with deterministic tie order") {
    val docs = Seq((1L, "xy xy zw")).toDF("doc_id", "text")
    val top = Subword.bpePairCounts(docs, k = 1).collect()
    assert(top.head.getString(0) == "xy" && top.head.getLong(2) == 2L)
  }

  test("bpePairCounts: single-char words contribute nothing") {
    val docs = Seq((1L, "a b c ab")).toDF("doc_id", "text")
    val out = Subword.bpePairCounts(docs, k = 10).collect()
    assert(out.map(_.getString(0)).toSet == Set("ab"))
  }

  test("containmentPairs: subset doc flagged where jaccard misses it") {
    // doc 2 is a strict prefix of doc 1: every 2-shingle of doc 2 appears
    // in doc 1 → containment 1.0, while jaccard = 5/14 < 0.5
    val long = (1 to 15).map(i => s"w$i").mkString(" ")
    val short = (1 to 6).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, n = 2, threshold = 0.9).collect()
    assert(cont.length == 1)
    val r = cont.head
    assert(r.getLong(r.fieldIndex("doc_a")) == 1L)
    assert(r.getAs[Double]("containment") == 1.0)
    val jac = Dedup.ngramJaccardPairs(docs, n = 2, threshold = 0.5).collect()
    assert(jac.isEmpty)
  }

  test("containmentPairs: disjoint docs produce no pair") {
    val docs = Seq((1L, "a b c d e f"), (2L, "p q r s t u"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairs(docs, n = 2, threshold = 0.1)
      .collect().isEmpty)
  }
}
