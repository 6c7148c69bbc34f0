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
    */
  private val registered =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** S2/S11: register every fixture table as a temp view for SQL access.
    * Memoized per (session, dir) — pass `force = true` after regenerating
    * fixture files in place or clobbering one of the view names, the two
    * cases where the memo would otherwise pin a stale registration.
    */
  def registerAll(spark: SparkSession, sfDir: String,
      force: Boolean = false): Unit = {
    val sid = SilverStore.sessionId(spark)
    if (force || !registered.get(sid).contains(sfDir)) {
      fixtureTables.foreach { n =>
        table(spark, sfDir, n).createOrReplaceTempView(n)
      }
      registered.put(sid, sfDir)
      ()
    }
  }
}
