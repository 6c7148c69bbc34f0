package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Boilerplate

class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // "x y z" repeats in docs 1 and 2 (a 3-word chunk in both); doc 3 is
  // clean; doc 4 is entirely the repeated passage.
  private def corpus = Seq(
    (1L, "x y z a b c d"),        // chunks: "x y z" | "a b c" | "d"
    (2L, "x y z q r s"),          // chunks: "x y z" | "q r s"
    (3L, "m n o p q"),            // chunks: "m n o" | "p q"
    (4L, "x y z")                 // chunk:  "x y z"
  ).toDF("doc_id", "text")

  test("passages: non-overlapping chunks, short tail kept, empty doc dropped") {
    val p = Boilerplate.passages(
      corpus.union(Seq((5L, "   ")).toDF("doc_id", "text")), p = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(p == Set(
      (1L, 0, "x y z"), (1L, 1, "a b c"), (1L, 2, "d"),
      (2L, 0, "x y z"), (2L, 1, "q r s"),
      (3L, 0, "m n o"), (3L, 1, "p q"),
      (4L, 0, "x y z")))
  }

  test("stats: per-doc boilerplate share against hand counts") {
    val s = Boilerplate.stats(corpus, p = 3, minDocs = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(s(1L)._1 == 3L && s(1L)._2 == 1L)
    assert(math.abs(s(1L)._3 - 0.333333333) < 1e-9) // round(1/3, 9)
    assert(s(2L) == ((2L, 1L, 0.5)))
    assert(s(3L) == ((2L, 0L, 0.0)))
    assert(s(4L) == ((1L, 1L, 1.0)))
  }

  test("clean removes exactly the boilerplate chunks, preserves order") {
    val c = Boilerplate.clean(corpus, p = 3, minDocs = 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c == Map(
      1L -> "a b c d",
      2L -> "q r s",
      3L -> "m n o p q",
      4L -> ""))
  }

  test("clean with a precomputed boilerplate set matches the derived one") {
    val bp = Boilerplate.boilerplateSet(corpus, p = 3, minDocs = 2)
    assert(bp.collect().map(_.getString(1)).toSeq == Seq("x y z"))
    val a = Boilerplate.clean(corpus, p = 3, minDocs = 2).collect().toSet
    val b = Boilerplate.clean(corpus, p = 3, minDocs = 2,
      boilerplate = Some(bp)).collect().toSet
    assert(a == b)
  }
}
