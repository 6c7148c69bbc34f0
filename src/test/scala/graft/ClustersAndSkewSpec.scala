package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Clusters
import graft.ops.SkewAgg

class ClustersAndSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connected components: chain merges transitively, singleton stays") {
    val docs = Seq(0L, 1L, 2L, 3L, 4L).toDF("doc_id")
    // chain 0-1, 1-2 (one component) + 3-4; nothing links them
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val cc = Clusters.connectedComponents(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(cc(0L) == 0L && cc(1L) == 0L && cc(2L) == 0L)
    assert(cc(3L) == 3L && cc(4L) == 3L)
    assert(cc.size == 5)
  }

  test("distributed label-propagation path agrees with union-find path") {
    val docs = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val viaLoop = Clusters.connectedComponents(docs, pairs, driverLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaUf = Clusters.connectedComponents(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLoop == viaUf)
    assert(viaLoop(2L) == 0L && viaLoop(5L) == 5L)
  }

  test("resolve: identical docs cluster together, canonical flagged") {
    val docs = Seq(
      (0L, "a b c d e f g h"), (1L, "a b c d e f g h"),
      (2L, "totally different words here now ok fine yes")
    ).toDF("doc_id", "text")
    val out = Clusters.resolve(docs, threshold = 0.5, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_canonical"))).toMap
    assert(out(0L) == ((0L, true)))
    assert(out(1L) == ((0L, false)))
    assert(out(2L) == ((2L, true)))
  }

  test("salted sums equal direct sums bit-for-bit") {
    val df = (1 to 1000).map(i => ("hot", i * 0.37)).toDF("k", "v")
      .unionByName(Seq(("cold", 1.5), ("cold", 2.5)).toDF("k", "v"))
    val direct = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,4)")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = SkewAgg.saltedSums(df, Seq("k"),
      Seq(SkewAgg.SumSpec("v", "s")), salt = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == direct)
  }
}
