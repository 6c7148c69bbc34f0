package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table catalog over a fixture directory of parquet files.
  *
  * The reference keeps everything as managed tables in a database
  * (`util/config.py:29-42`, `01_Data_Prep.py:93-100`); our engine's
  * equivalent is a thin catalog that resolves logical table names to
  * parquet directories and (optionally) registers them as temp views so
  * `spark.sql` programs can address them by name (SURVEY.md §1.1, S2/S11).
  *
  * At 100 TB each of these would be a partitioned parquet/iceberg root; the
  * API stays the same — only the path layout changes.
  */
object Catalog {

  /** Fixture tables the driver generates (TESTDATA.md). */
  val fixtureTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Last fixture dir registered per session: registering reads all 10
    * parquet schemas (~0.8s of footer IO), and the reference registers its
    * tables once at ingest (`01_Data_Prep.py:93-100`), not per query — so
    * repeat calls for the same (session, dir) are no-ops. A DIFFERENT dir
    * re-registers: the views are session-global and must follow the caller.
    *
    * Keyed WEAKLY on the session object itself (not an identity-hash
    * string): identity hashes can be reused after a session is GC'd — a
    * colliding later session would silently skip registration into its own
    * (empty) temp-view catalog — and weak keys also let dead sessions'
    * entries be collected instead of growing for the JVM lifetime.
    */
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String])

  /** S2/S11: register every fixture table as a temp view for SQL access.
    * Memoized per (session, dir) — pass `force = true` after regenerating
    * fixture files in place. A memo hit is only trusted when the views are
    * actually still present in the session's catalog, so dropping or
    * clobbering a view name re-registers instead of silently resolving to
    * the clobbered view.
    *
    * Registration is per-table fault-isolated: one missing/corrupt fixture
    * registers every OTHER table first and then throws naming the bad
    * ones, so queries over healthy tables keep working (and the memo is
    * not populated — a retry re-attempts the failed tables).
    */
  def registerAll(spark: SparkSession, sfDir: String,
      force: Boolean = false): Unit = {
    val hit = !force && registered.get(spark) == sfDir &&
      fixtureTables.forall(spark.catalog.tableExists)
    if (!hit) {
      registered.remove(spark)
      val failures = fixtureTables.flatMap { n =>
        try { table(spark, sfDir, n).createOrReplaceTempView(n); None }
        catch { case scala.util.control.NonFatal(e) => Some((n, e)) }
      }
      if (failures.isEmpty) { registered.put(spark, sfDir); () }
      else throw new RuntimeException(
        s"registerAll($sfDir): failed for ${failures.map(_._1).mkString(", ")}",
        failures.head._2)
    }
  }
}
