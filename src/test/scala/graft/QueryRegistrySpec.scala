package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the registry itself (driver-facing invariants). */
class QueryRegistrySpec extends AnyFunSuite {

  test("no duplicate query names; every oracle key is a query") {
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every oracle is non-empty SQL") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("SELECT"), s"$name oracle has no SELECT")
    }
  }

  test("every query plans (analysis passes) against sf0.001") {
    // Planning-only: resolves every query's logical plan without executing
    // it (execution parity is graft.Verify's job — see tools/check.py).
    val spark = TestSpark.spark
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, s"$name produced no columns")
    }
  }
}
