package graft

/** Dev tool: time a subset of `SparkEntry.queries` by name under the same
  * session/warm-up conditions as [[Bench]] (pinned silver, registered
  * catalog, full materialization via `toRdd.count`). Repeats each query
  * `SPARK_GRAFT_REPS` times (default 2) so plan-construction vs execution
  * noise is visible while iterating on one operator without paying a full
  * bench run.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQueries <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.core.Catalog.registerAll(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[time] registerAll: $e") }
    graft.core.SilverStore.enable()
    try graft.silver.TransactionsAdj(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[time] silver: $e") }
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        println(f"[time] $name%-32s rep$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }
    spark.stop()
  }
}
