package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.FuzzyJoin

class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("deletionKeys: identity first, then each single deletion") {
    val keys = Seq("abc").toDF("s")
      .select(FuzzyJoin.deletionKeys(col("s")).as("k"))
      .head().getSeq[String](0)
    assert(keys == Seq("abc", "bc", "ac", "ab"))
  }

  test("selfJoin finds exactly the naive levenshtein<=1 pairs (property)") {
    // Random short strings over a 3-letter alphabet: dense distance-1
    // neighborhoods, including insert/delete pairs (different lengths).
    val rnd = new scala.util.Random(7)
    val names = (1 to 120).map { _ =>
      val n = 3 + rnd.nextInt(4)
      (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }.distinct
    val df = names.toDF("name")

    val got = FuzzyJoin.selfJoin(df, "name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- names; b <- names if a < b
      dd = lev(a, b) if dd <= 1
    } yield (a, b, dd.toLong)).toSet

    assert(got == want)
  }

  test("short and null values are dropped, duplicates collapse") {
    val df = Seq(Some("ab"), Some("abcd"), Some("abcd"), Some("abce"), None)
      .toDF("name")
    val got = FuzzyJoin.selfJoin(df, "name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("abcd", "abce", 1L)))
  }
}
