package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Catalog

/** Registration memo + fault isolation for the fixture catalog (S2/S11). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("registerAll registers every fixture table as a queryable view") {
    Catalog.registerAll(spark, sf, force = true)
    assert(Catalog.fixtureTables.forall(spark.catalog.tableExists))
    assert(spark.sql("SELECT count(*) AS n FROM region").head().getLong(0) > 0)
  }

  test("a dropped view is re-registered despite the memo") {
    Catalog.registerAll(spark, sf, force = true)
    spark.catalog.dropTempView("nation")
    assert(!spark.catalog.tableExists("nation"))
    // memo hit for (session, sf) — but the verification sees the missing
    // view and must re-register rather than trust the stale entry
    Catalog.registerAll(spark, sf)
    assert(spark.catalog.tableExists("nation"))
  }

  test("one bad fixture registers the healthy tables and throws naming it") {
    val dir = Files.createTempDirectory("catalog-spec")
    Catalog.fixtureTables.filterNot(_ == "orders").foreach { t =>
      Files.copy(Paths.get(s"$sf/$t.parquet"),
        dir.resolve(s"$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    val e = intercept[RuntimeException] {
      Catalog.registerAll(spark, dir.toString, force = true)
    }
    assert(e.getMessage.contains("orders"))
    // every OTHER table registered before the throw (fault isolation)
    assert(Catalog.fixtureTables.filterNot(_ == "orders")
      .forall(spark.catalog.tableExists))
    // the memo was NOT populated: a retry against a healthy dir registers
    Catalog.registerAll(spark, sf)
    assert(spark.catalog.tableExists("orders"))
  }
}
