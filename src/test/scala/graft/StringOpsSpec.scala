package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{EditDistanceImpl, StringOps}

class StringOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    // reference DP over codepoints (same semantics as Spark/DuckDB)
    val s = a.codePoints.toArray; val t = b.codePoints.toArray
    val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  private def within(a: String, b: String, k: Int): Boolean =
    EditDistanceImpl.within(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("within == (levenshtein <= k) on random ASCII strings, k in 0..3") {
    val rnd = new scala.util.Random(11)
    val strs = (1 to 150).map { _ =>
      val n = rnd.nextInt(8)
      (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    for (a <- strs.take(60); b <- strs.take(60); k <- 0 to 3)
      assert(within(a, b, k) == (lev(a, b) <= k),
        s"within('$a','$b',$k) != lev=${lev(a, b)}")
  }

  test("within matches on multi-byte (non-ASCII) strings") {
    val strs = Seq("", "é", "éé", "née", "nee", "naïve", "naive", "日本語",
      "日本誤", "日本", "€uro", "euro", "grüße", "grusse", "gruße")
    for (a <- strs; b <- strs; k <- 0 to 3)
      assert(within(a, b, k) == (lev(a, b) <= k),
        s"within('$a','$b',$k) != lev=${lev(a, b)}")
  }

  test("k=1 two-pointer path agrees with the DP on adversarial shapes") {
    val cases = Seq(
      ("abc", "abc"), ("abc", "abd"), ("abc", "ab"), ("ab", "abc"),
      ("abc", "bc"), ("abc", "acc"), ("aaa", "aab"), ("aab", "aba"),
      ("", ""), ("", "a"), ("a", ""), ("", "ab"),
      ("abcdef", "abdcef"), ("aaaa", "aaaa"), ("aaaa", "aaab"))
    for ((a, b) <- cases)
      assert(within(a, b, 1) == (lev(a, b) <= 1), s"('$a','$b')")
  }

  test("edit_within column agrees with levenshtein<=k in a plan") {
    StringOps.register(spark)
    val rnd = new scala.util.Random(3)
    val pairs = (1 to 400).map { _ =>
      def s() = (1 to rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      (s(), s())
    }
    val df = pairs.toDF("a", "b")
    val diff = df.filter(
      StringOps.edit_within(col("a"), col("b"), 1) =!=
        (levenshtein(col("a"), col("b")) <= 1)).count()
    assert(diff == 0)
    // null propagation matches the built-in (null in -> null out)
    val nulls = Seq((null.asInstanceOf[String], "x")).toDF("a", "b")
      .select(StringOps.edit_within(col("a"), col("b"), 1).as("r"))
      .head()
    assert(nulls.isNullAt(0))
  }
}
