package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date
import graft.ops.Scd

class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("collapses runs into intervals with lead-closed valid_to") {
    // u1: a a b a  → [a 1-2](2) [b 3](1) [a 4](1, open)
    // u2: c        → [c 1](1, open)
    val obs = Seq(
      (1L, d("2024-01-01"), "a"), (1L, d("2024-01-02"), "a"),
      (1L, d("2024-01-03"), "b"), (1L, d("2024-01-04"), "a"),
      (2L, d("2024-01-01"), "c"))
      .toDF("k", "day", "attr")
    val got = Scd.type2(obs, Seq("k"), "day", "attr")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString),
        r.getLong(4))).toSet
    assert(got == Set(
      (1L, "a", "2024-01-01", Some("2024-01-03"), 2L),
      (1L, "b", "2024-01-03", Some("2024-01-04"), 1L),
      (1L, "a", "2024-01-04", None, 1L),
      (2L, "c", "2024-01-01", None, 1L)))
  }

  test("null attributes form their own runs, null-safely") {
    val obs = Seq(
      (1L, d("2024-01-01"), null), (1L, d("2024-01-02"), null),
      (1L, d("2024-01-03"), "x"))
      .toDF("k", "day", "attr")
    val got = Scd.type2(obs, Seq("k"), "day", "attr")
      .collect().map(r => (Option(r.getString(1)), r.getLong(4))).toSet
    assert(got == Set((None, 2L), (Some("x"), 1L)))
  }

  test("intervals tile each key's history: valid_to chains to next valid_from") {
    val rnd = new scala.util.Random(7)
    val obs = (for (k <- 1 to 5; i <- 0 to 20) yield
      (k.toLong, d(f"2024-01-${i + 1}%02d"), rnd.nextInt(2).toString))
      .toDF("k", "day", "attr")
    val rows = Scd.type2(obs, Seq("k"), "day", "attr")
      .orderBy("k", "valid_from").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.sliding(2).foreach {
        case Array(a, b) => assert(a.getDate(3) == b.getDate(2))
        case _ =>
      }
      assert(rs.last.isNullAt(3))
      assert(rs.map(_.getLong(4)).sum == 21L)
    }
  }
}
