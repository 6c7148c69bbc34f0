package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface: every custom Catalyst function is
  * callable from plain spark.sql on a GraftSession-built session, with NO
  * imperative register() call anywhere in the lineage.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_dot resolves from SQL") {
    val got = spark.sql(
      """SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
        |""".stripMargin).as[Double].head()
    assert(got == 11.0)
  }

  test("graft_edit_within resolves from SQL") {
    val rows = spark.sql(
      """SELECT graft_edit_within('kitten', 'sitten', 1) AS a,
        |       graft_edit_within('kitten', 'sittin', 1) AS b""".stripMargin)
      .collect().head
    assert(rows.getBoolean(0) && !rows.getBoolean(1))
  }

  test("bloom sketch + probe resolve from SQL end to end") {
    spark.range(1000).createOrReplaceTempView("ext_keys")
    val bf = spark.sql(
      "SELECT graft_bloom_agg(xxhash64(id), 1000) FROM ext_keys")
      .head().getAs[Array[Byte]](0)
    val probes = spark.range(2000)
      .select(col("id"),
        graft.ops.BloomPrune.mightContain(lit(bf), xxhash64(col("id")))
          .as("hit"))
      .filter(col("hit"))
    // no false negatives: all 1000 inserted ids survive
    assert(probes.filter(col("id") < 1000).count() == 1000)
  }
}
