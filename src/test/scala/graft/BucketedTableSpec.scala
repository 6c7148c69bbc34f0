package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.BucketedTable

class BucketedTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed-bucketed equi-join plans without a shuffle exchange") {
    val n = 5000
    val a = (1 to n).map(i => (i.toLong, i * 1.0)).toDF("k", "va")
    val b = (1 to n).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    BucketedTable.write(a, "graft_bucket_a", "k", 4)
    BucketedTable.write(b, "graft_bucket_b", "k", 4)
    // hint the INPUTS (a hint on the join result is a no-op) so the plan
    // is sort-merge and the exchange question is real
    val smj = BucketedTable.read(spark, "graft_bucket_a").hint("merge")
      .join(BucketedTable.read(spark, "graft_bucket_b").hint("merge"), Seq("k"))
    val plan = smj.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(smj.count() == n)
  }

  test("bucketed vs plain: plain join does shuffle (control)") {
    val n = 5000
    val a = (1 to n).map(i => (i.toLong, i * 1.0)).toDF("k", "va")
    val b = (1 to n).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    val plan = a.hint("merge").join(b.hint("merge"), Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning"))
  }
}
