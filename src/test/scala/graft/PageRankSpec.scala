package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PageRank

class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("symmetric complete graph converges to uniform ranks") {
    // K3 both directions: perfectly symmetric → rank stays 1/3
    val edges = Seq((1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2))
      .toDF("src", "dst")
    val out = PageRank.run(edges, iterations = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val third = BigDecimal(1.0 / 3.0)
      .setScale(15, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.size == 3)
    out.values.foreach(v => assert(math.abs(v - third) < 1e-12, s"$v"))
  }

  test("hub attracts rank: star center outranks leaves") {
    // undirected star 0-{1,2,3,4}: center receives from 4 nodes
    val leaves = (1 to 4)
    val edges = (leaves.map(l => (0, l)) ++ leaves.map(l => (l, 0)))
      .toDF("src", "dst")
    val out = PageRank.run(edges, iterations = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(leaves.forall(l => out(0) > out(l)))
    // leaves are symmetric → identical ranks
    assert(leaves.map(out).distinct.size == 1)
  }

  test("matches a driver-side fold with the same quantization") {
    val rnd = new scala.util.Random(11)
    val raw = (1 to 60).map(_ => (rnd.nextInt(12), rnd.nextInt(12)))
      .filter(e => e._1 != e._2).distinct
    val sym = (raw ++ raw.map(_.swap)).distinct
    val out = PageRank.run(sym.toDF("src", "dst").repartition(5), 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // referee
    def q15(d: Double) = BigDecimal(d)
      .setScale(15, BigDecimal.RoundingMode.HALF_UP)
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct
    val n = nodes.size
    val deg = sym.groupBy(_._1).map { case (s, es) => s -> es.size }
    var rank = nodes.map(v => v -> q15(1.0 / n).toDouble).toMap
    for (_ <- 1 to 3) {
      val in = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => q15(rank(e._1) / deg(e._1))).sum.toDouble
      }
      rank = nodes.map(v => v ->
        q15(0.15000000000000002 / n + 0.85 * in.getOrElse(v, 0.0)).toDouble)
        .toMap
    }
    nodes.foreach(v => assert(out(v) == rank(v), s"node $v"))
  }
}
