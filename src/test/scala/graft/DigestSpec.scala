package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Digest

class DigestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
  private def digest(d: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = Digest.tableDigest(d, "t", Seq(col("k"), col("v"))).head()
    (r.getAs[Long]("n_rows"), r.getAs[Long]("digest"))
  }

  test("digest is invariant to row order and partitioning") {
    val base = digest(df)
    assert(digest(df.orderBy(col("k").desc)) == base)
    assert(digest(df.repartition(7)) == base)
    assert(digest(df.repartition(1)) == base)
  }

  test("digest changes when any row changes, counts track rows") {
    val base = digest(df)
    val changed = digest(Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("k", "v"))
    assert(changed._1 == base._1 && changed._2 != base._2)
    val dropped = digest(df.filter(col("k") =!= 2L))
    assert(dropped._1 == 2L && dropped._2 != base._2)
  }

  test("empty relation digests to (0, 0), not null") {
    assert(digest(df.filter(lit(false))) == ((0L, 0L)))
  }
}
