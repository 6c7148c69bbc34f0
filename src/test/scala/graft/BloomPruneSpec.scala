package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.BloomPrune

class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val large =
    (Seq.tabulate(5000)(i => (Option(i.toLong), s"v$i")) :+
      ((None: Option[Long]), "null-key")).toDF("k", "payload")

  private lazy val small = Seq.tabulate(200)(i => i.toLong * 37)
    .toDF("sk") // 0, 37, ... 7363 — 200 keys, 64 beyond large's range

  test("pruned semi join equals the plain semi join exactly") {
    val got = BloomPrune.prunedSemiJoin(large, small, "k", "sk", 1000L)
      .select("k").as[Long].collect().sorted
    val want = large.join(small, col("k") === col("sk"), "left_semi")
      .select("k").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(want.length == 136) // 0, 37, ..., 4995 within 0..4999
  }

  test("null keys never match; duplicate small keys do not duplicate rows") {
    val smallDup = small.union(small)
    val got = BloomPrune.prunedSemiJoin(large, smallDup, "k", "sk", 1000L)
    assert(got.filter(col("k").isNull).count() == 0)
    assert(got.filter(col("k") === 0L).count() == 1)
  }

  test("empty key side yields empty result") {
    assert(BloomPrune.prunedSemiJoin(
      large, small.filter(lit(false)), "k", "sk", 1000L).count() == 0)
  }

  test("the might_contain prune sits below the join (pre-exchange)") {
    // a file-backed source: on a LocalRelation the optimizer folds the
    // whole (deterministic) probe at plan time, which hides the shape
    // this test pins — the FILTER must survive on the scan side, below
    // the join, so non-candidate rows never reach the exchange
    val dir = java.nio.file.Files.createTempDirectory("bloomspec").toString
    large.write.mode("overwrite").parquet(dir)
    val largeFile = spark.read.parquet(dir)
    val plan = BloomPrune.prunedSemiJoin(largeFile, small, "k", "sk", 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    val joinIdx = plan.indexOf("Join")
    val probeIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "bloom probe should be on the join's input (printed below it)")
  }

  test("property: equals the plain semi join on random key sets") {
    val rnd = new scala.util.Random(41)
    (1 to 5).foreach { trial =>
      // overlapping ranges with duplicates on both sides; tiny sketch
      // (high fpp) to stress the exact-verify stage
      val l = Seq.fill(800)(rnd.nextInt(500).toLong).toDF("k")
      val r = Seq.fill(120)(rnd.nextInt(700).toLong).toDF("sk")
      val got = BloomPrune.prunedSemiJoin(l, r, "k", "sk", 64L)
        .select("k").as[Long].collect().sorted.toSeq
      val want = l.join(r, col("k") === col("sk"), "left_semi")
        .select("k").as[Long].collect().sorted.toSeq
      assert(got == want, s"trial $trial")
    }
  }

  test("sketch is sketch-sized, not data-sized") {
    val bytes = BloomPrune.sketch(small, "sk", 1000L)
    assert(bytes.nonEmpty && bytes.length < 64 * 1024,
      s"sketch for 200 keys should be small, got ${bytes.length} bytes")
  }
}
