package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Ntile

class NtileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(n: Int, buckets: Int): Unit = {
    val rnd = new scala.util.Random(n * 31 + buckets)
    val df = (1 to n).map(i => (i.toLong, rnd.nextInt(50).toDouble))
      .toDF("k", "v").repartition(5)
    val got = Ntile.global(df, Seq(col("v").desc, col("k").asc), buckets, "b")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val want = df.withColumn("b",
        ntile(buckets).over(Window.orderBy(col("v").desc, col("k").asc)))
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong)).toMap
    assert(got == want, s"n=$n buckets=$buckets")
  }

  test("matches the single-partition window ntile across shapes") {
    check(1, 10)     // n < buckets
    check(10, 10)    // n == buckets
    check(97, 10)    // remainder buckets
    check(100, 7)    // uneven division
    check(1000, 10)  // ties in v across partition boundaries
  }

  test("bucket sizes are equi-depth: first n%b buckets one row larger") {
    val df = (1L to 23L).toDF("k")
    val sizes = Ntile.global(df, Seq(col("k").asc), 5, "b")
      .groupBy("b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1L -> 5L, 2L -> 5L, 3L -> 5L, 4L -> 4L, 5L -> 4L))
  }
}
