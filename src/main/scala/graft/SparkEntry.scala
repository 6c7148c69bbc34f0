package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Every operator from SURVEY.md §2 that is SQL-expressible appears here
  * twice: as a Spark program in `queries` and as equivalent ANSI SQL in
  * `oracleSql` (hash-matched by the driver under DuckDB on the same parquet
  * fixtures). Column names/aliases are kept identical on both sides; money
  * aggregates sum through DECIMAL(18,4) so the result is independent of
  * float summation order (Spark's final-aggregate combine order is not
  * deterministic, DuckDB's differs again — decimal addition is exact, so
  * both engines produce bit-identical doubles after the cast back).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    pipeline.Flagship.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = QueryRegistry.oracleSql
}
