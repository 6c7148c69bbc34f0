package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Retail
import graft.features.FeatureBuilder
import graft.ops.Commodities

/** Physical-plan shape audit: the properties that make these operators
  * scale are visible in the plan — broadcasts on small sides, pushed
  * filters, pruned scan schemas, top-k without a global sort. These tests
  * pin them so a refactor can't silently regress the plan.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("fact ⋈ products dim is a broadcast hash join") {
    val p = plan(Commodities.topCommodities(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(Commodities.topCommodities(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("orders scan schema is pruned to the two join/projection columns") {
    val p = plan(Retail.transactions(spark, sf))
    assert(p.contains("struct<o_orderkey:bigint,o_custkey:bigint>"),
      s"orders scan should read 2 columns only:\n$p")
  }

  test("feature-window pre-filter is pushed to the parquet scan") {
    val tx = graft.silver.TransactionsAdj(spark, sf)
    val p = plan(FeatureBuilder.build(tx, FeatureBuilder.household))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"day bounds should reach the lineitem scan:\n$p")
  }

  test("universe cross join broadcasts the 10-row commodity side") {
    val txc = FeatureBuilder.txWithCommodity(spark, sf)
    val labels = graft.labels.LabelBuilder.labels(
      txc, Commodities.commoditiesToScore(spark, sf),
      FeatureBuilder.bounds(txc)._2.minusDays(30))
    val p = plan(labels)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected broadcast for the commodity side:\n$p")
  }

  test("a broadcastable lookup plans a broadcast join even after checkpoint") {
    // the checkpoint strips plan stats AND hints; the Lookup-level flag
    // must still force the broadcast at join time (catalog-bounded grains
    // are broadcastable at ANY data scale)
    import spark.implicits._
    import graft.train.TrainingSetBuilder
    val spine = Seq((1L, "A"), (2L, "B")).toDF("household_key", "commodity_desc")
    val cm = Seq(("A", 1.0)).toDF("commodity_desc", "m").localCheckpoint(true)
    val p = plan(TrainingSetBuilder.lookup(spine,
      TrainingSetBuilder.Lookup(cm, Seq("commodity_desc"), "commodity__",
        broadcastable = true), joinDay = false))
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast join for the broadcastable lookup:\n$p")
    // (without the flag, Spark 4 happens to carry origin stats through a
    // localCheckpoint and may still auto-broadcast small sides locally —
    // the flag exists to DECLARE catalog-boundedness so the broadcast
    // survives when stats are absent or the side is big-but-bounded)
  }

  test("sampled vocabulary broadcasts the candidate set into the exact pass") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.text.TextAnalysis.vocabularySampled(corpus, k = 20))
    // the exact re-count must semi-prune the term stream with a broadcast
    // of the (tiny) candidate table, never shuffle the full vocabulary
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast candidate join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected top-k operator, not a global sort:\n$p")
  }

  test("edit-distance verify stays inside whole-stage codegen") {
    // parquet-backed input: a LocalRelation would be constant-folded by
    // ConvertToLocalRelation and leave no Filter to audit
    graft.functions.StringOps.register(spark)
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang").as("a"), col("source").as("b"))
      .filter(graft.functions.StringOps.edit_within(col("a"), col("b"), 1))
    val p = plan(df)
    // the predicate compiles into the codegen'd Filter ("*(n) Filter"),
    // not a CodegenFallback wrapper around an interpreted expression
    assert("\\*\\(\\d+\\) Filter".r.findAllIn(p).nonEmpty,
      s"expected codegen'd filter:\n$p")
    df.count() // executes the generated code path
  }

  test("basket pairs: single-lineage plan, no self-join, broadcast supports") {
    val tx = graft.silver.TransactionsAdj(spark, sf)
    val df = graft.ops.BasketPairs.topPairs(tx, 2, 10)
    df.queryExecution.toRdd.count() // finalize AQE stages
    // the AQE toString appends an "== Initial Plan ==" copy; audit Final only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // pair generation is the per-basket explode, not a basket_id self-join
    assert(!p.contains("SortMergeJoin"), s"unexpected self-join:\n$p")
    // support counts and the basket total both arrive by broadcast
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      s"expected broadcast supports + total:\n$p")
    // the fact-level distinct (basket_id, product_id) exchange exists once
    // per consumer (freq + sets = 2), never the 4 copies of a self-join plan
    assert("hashpartitioning\\(basket_id#\\d+L, product_id".r
      .findAllIn(p).size <= 2, s"distinct-items lineage duplicated:\n$p")
  }

  test("quantize: per-row pass has no exchange after the broadcast stats row") {
    val emb = graft.core.Catalog.table(spark, sf, "embeddings")
    val df = graft.similarity.Quantize.auditInt8(emb)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // exactly one shuffle exists: the d-key dim-stats aggregate; the audit
    // itself rides the broadcast nested-loop of the 1-row stats frame
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"stats row should broadcast:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"quantize pass must not shuffle the vectors:\n$p")
  }

  test("rec top-k filter pushes into WindowGroupLimit (map-side top-3)") {
    import org.apache.spark.sql.expressions.Window
    val txc = FeatureBuilder.txWithCommodity(spark, sf)
    val pair = txc.groupBy("household_key", "commodity_desc")
      .agg(countDistinct(col("basket_id")).as("pos_baskets"))
    val w = Window.partitionBy("household_key")
      .orderBy(col("pos_baskets").desc, col("commodity_desc"))
    val top3 = pair.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    val p = plan(top3)
    assert(p.contains("WindowGroupLimit"),
      s"rank filter should keep map-side top-3s before the exchange:\n$p")
  }

  test("key-skew profile plans no sort and no window") {
    val tx = graft.silver.TransactionsAdj(spark, sf)
    val df = graft.ops.KeySkew.profile(tx, Seq("household_key", "product_id"))
    val p = plan(df)
    assert(!p.contains("Window"), s"profile must not use windows:\n$p")
    // top-share/hot-key logic must not induce a global sort (a Sort for
    // the union output order is absent too — output is unordered)
    assert(!p.toLowerCase.contains("sortmergejoin"),
      s"profile must not shuffle-join the fact:\n$p")
  }

  test("silver projection is a single codegen'd Project over the scan") {
    val df = graft.silver.TransactionsAdj(spark, sf)
    val qe = df.queryExecution
    qe.executedPlan.execute().count() // finalize AQE on THIS plan instance
    // the AQE toString includes Initial + Final sections; audit Final only
    val p = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    // one Project per select (no withColumn chains), all fused into a
    // single codegen stage ("*(n) Op" markers share the stage id)
    assert(p.contains("*("), s"expected whole-stage-codegen markers:\n$p")
    assert("\\*\\(\\d+\\) Project".r.findAllIn(p).size <= 2, s"too many Projects:\n$p")
  }
}
