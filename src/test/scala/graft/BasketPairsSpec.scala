package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.BasketPairs

class BasketPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // baskets: 1:{A,B,C} 2:{A,B} 3:{A,B} 4:{B,C} 5:{A} 6:{C,D}
  // supports: A=4 B=4 C=3 D=1; pairs (support>=2 prunes D):
  //   (A,B)=3 (A,C)=1 (B,C)=2
  private val tx = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"), (2L, "B"), // duplicate line within a basket
    (3L, "A"), (3L, "B"),
    (4L, "B"), (4L, "C"),
    (5L, "A"),
    (6L, "C"), (6L, "D"))

  test("pair supports, pruning, and lift on a hand-checked basket set") {
    val df = tx.toDF("basket_id", "product_id")
    val got = BasketPairs.topPairs(df, 2, 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // 6 distinct baskets; lift(A,B) = 3*6/(4*4), lift(B,C) = 2*6/(4*3)
    assert(got.toSeq == Seq(
      ("A", "B", 3L, 4L, 4L, 18.0 / 16.0),
      ("B", "C", 2L, 4L, 3L, 12.0 / 12.0),
      ("A", "C", 1L, 4L, 3L, 6.0 / 12.0)))
  }

  test("minSupport=1 keeps the singleton product; pairs stay canonical") {
    val df = tx.toDF("basket_id", "product_id")
    val got = BasketPairs.topPairs(df, 1, 10).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got.contains(("C", "D")))
    assert(got.forall { case (a, b) => a < b })
  }

  test("top-k truncates by support with (pa, pb) tie order") {
    val df = tx.toDF("basket_id", "product_id")
    val got = BasketPairs.topPairs(df, 2, 1).collect()
    assert(got.length == 1 && got.head.getString(0) == "A"
      && got.head.getString(1) == "B")
  }
}
