package graft

import org.apache.spark.sql.SparkSession

/** Shared session prologue for the dev mains ([[TimeQueries]],
  * [[ExplainQuery]]): build the [[graft.core.GraftSession]], register the
  * fixture catalog, enable + materialize the pinned silver — the SAME
  * conditions [[Bench]] times under, in one place, so a conf or warm-up
  * step added for the bench cannot silently drift out of the tools used
  * to audit it.
  */
object DevHarness {
  final case class Ctx(spark: SparkSession, sfDir: String)

  def init(tag: String): Ctx = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.core.Catalog.registerAll(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[$tag] registerAll: $e") }
    graft.core.SilverStore.enable()
    try graft.silver.TransactionsAdj(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[$tag] silver: $e") }
    Ctx(spark, sfDir)
  }

  def query(name: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
}
