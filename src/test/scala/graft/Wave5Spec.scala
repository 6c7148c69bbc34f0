package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-checked merge sequence on a tiny corpus") {
    // vocab: low ×2, lower ×1 → pairs r1: (l,o)=3, (o,w)=3, (w,e)=1,
    // (e,r)=1; tie (l,o)/(o,w) breaks to (l,o). Then (lo,w)=3; then the
    // 1-weight tie (e,r) < (low,e) lexicographically; then (low,er).
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val out = graft.text.Subword.bpeTrainMerges(docs, rounds = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1, "l", "o", 3L), (2, "lo", "w", 3L),
      (3, "e", "r", 1L), (4, "low", "er", 1L)))
  }

  test("overlapping pairs count per position; greedy merge is non-overlapping") {
    // "aaaa": pair (a,a) occurs at 3 adjacent positions, but the merge
    // produces [aa, aa] (greedy left-to-right), so round 2 merges (aa,aa)
    // and round 3 finds nothing — the loop stops early.
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = graft.text.Subword.bpeTrainMerges(docs, rounds = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("words past the maxWordChars contract are excluded from training") {
    val long = "x" * (graft.text.Subword.maxWordChars + 1)
    val docs = Seq((1L, s"$long $long ab ab")).toDF("doc_id", "text")
    val out = graft.text.Subword.bpeTrainMerges(docs, rounds = 1).collect()
    // only "ab" participates: the winning pair is (a, b) weight 2, never
    // the (x, x) mass of the over-limit word
    assert(out.length == 1)
    assert((out(0).getString(1), out(0).getString(2), out(0).getLong(3))
      == (("a", "b", 2L)))
  }

  test("carriage returns inside words symbolize like any character") {
    // Java '.' skips \r — the [\s\S] class must not: "a\rb" is three
    // symbols, so round 1 counts (a, \r) and (\r, b), both weight 2;
    // the tie breaks on sym_left and '\r' (0x0D) < 'a'
    val docs = Seq((1L, "a\rb a\rb")).toDF("doc_id", "text")
    val out = graft.text.Subword.bpeTrainMerges(docs, rounds = 1).collect()
    assert(out.length == 1)
    assert((out(0).getString(1), out(0).getString(2), out(0).getLong(3))
      == (("\r", "b", 2L)))
  }

  test("consecutive-run merging matches the sequential greedy scan") {
    // "a a a" (as one word "aaa"): merge (a,a) → [aa, a], NOT [aa] or
    // [a, aa]; round 2 then merges (aa, a).
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val out = graft.text.Subword.bpeTrainMerges(docs, rounds = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }
}

class RatioDeltaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ratio and delta-method SE match a hand computation") {
    // arm A: units (x, y) = (2, 10), (4, 30) → R = 40/6
    val df = Seq(("a", 2.0, 10.0), ("a", 4.0, 30.0),
      ("b", 1.0, 5.0), ("b", 1.0, 5.0)).toDF("arm", "x", "y")
    val out = graft.ops.Experiment.ratioDelta(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 2L)
    assert(a.getDouble(2) == 6.0 && a.getDouble(3) == 40.0)
    assert(math.abs(a.getDouble(4) - 40.0 / 6.0) < 1e-9)
    // hand delta method: n=2, mu_x=3, var_x=1, var_y=100, cov=10, R=20/3
    // var(R) = (100 + R^2*1 - 2R*10)/(9*2)
    val r = 40.0 / 6.0
    val se = math.sqrt((100.0 + r * r - 20.0 * r) / 9.0 / 2.0)
    assert(math.abs(a.getDouble(5) - se) < 1e-8)
    // arm b: both units identical → zero variance, SE exactly 0
    assert(out("b").getDouble(5) == 0.0)
    assert(out("b").getDouble(4) == 5.0)
  }
}
