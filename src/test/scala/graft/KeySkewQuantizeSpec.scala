package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.KeySkew
import graft.similarity.Quantize

class KeySkewQuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KeySkew.profile: uniform key has skew_ratio 1, no hot keys") {
    val df = (1 to 100).map(i => (i % 10, i)).toDF("k", "v")
    val r = KeySkew.profile(df, Seq("k")).head()
    assert(r.getAs[Long]("rows") == 100L)
    assert(r.getAs[Long]("n_keys") == 10L)
    assert(r.getAs[Long]("max_freq") == 10L)
    assert(r.getAs[Double]("skew_ratio") == 1.0)
    assert(r.getAs[Long]("n_hot_keys") == 0L)
  }

  test("KeySkew.profile: one dominant key flagged hot") {
    // key 0: 991 rows; keys 1..9: 1 row each → avg = 100, max/avg = 9.91
    val df = ((1 to 991).map(_ => 0) ++ (1 to 9)).map(k => (k, 1))
      .toDF("k", "v")
    val r = KeySkew.profile(df, Seq("k"), hotFactor = 5.0).head()
    assert(r.getAs[Long]("max_freq") == 991L)
    assert(r.getAs[Double]("top_share") == 0.991)
    assert(r.getAs[Long]("n_hot_keys") == 1L)
  }

  test("KeySkew.profile: long form emits one row per key column") {
    val df = Seq((1, "a"), (2, "b")).toDF("k1", "k2")
    val out = KeySkew.profile(df, Seq("k1", "k2")).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("k1", "k2"))
  }

  test("Quantize.auditInt8: codes span [0, 255] and reconstruct within half a level") {
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(8)(d => (i * 8 + d).toFloat / 10f))
    }
    val out = Quantize.auditInt8(vecs.toDF("vec_id", "embedding")).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getAs[Long]("n_dims") == 8L)
      assert(r.getAs[Long]("q_min") >= 0L)
      assert(r.getAs[Long]("q_max") <= 255L)
    }
    // per-dim range here is (19*8)/10 - 0 ... constant across dims? No:
    // dim d spans [d/10, (152+d)/10] → width 15.2, level 15.2/255
    val maxLevelHalf = (15.2 / 255.0) / 2.0 + 1e-9
    out.foreach(r => assert(r.getAs[Double]("max_abs_err") <= maxLevelHalf))
    // extremes hit the code range ends
    assert(out.exists(_.getAs[Long]("q_min") == 0L))
    assert(out.exists(_.getAs[Long]("q_max") == 255L))
  }

  test("Quantize.auditInt8: constant dimension quantizes to 0 with 0 error") {
    val vecs = Seq((1L, Array(1.5f, 2.0f)), (2L, Array(1.5f, 3.0f)))
    val out = Quantize.auditInt8(vecs.toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // dim 0 constant → code 0 everywhere; dim 1 spans [2,3]
    assert(out(1L).getAs[Long]("q_min") == 0L)
    assert(out(1L).getAs[Double]("max_abs_err") == 0.0) // 2.0 is exactly level 0
    assert(out(2L).getAs[Long]("q_max") == 255L)
  }

  test("Quantize.dimStats: one row per dimension with true bounds") {
    val vecs = Seq((1L, Array(0f, 10f)), (2L, Array(4f, -2f)))
    val st = Quantize.dimStats(vecs.toDF("vec_id", "embedding"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(st(0) == ((0.0, 4.0)))
    assert(st(1) == ((-2.0, 10.0)))
  }
}
