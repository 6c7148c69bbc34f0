package graft

/** Dev tool: print the formatted physical plan of named queries under the
  * same session conditions as [[Bench]] (pinned silver, registered
  * catalog) — for auditing codegen coverage, exchange counts, and
  * aggregate implementations without a UI.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQuery <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.core.Catalog.registerAll(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[explain] registerAll: $e") }
    graft.core.SilverStore.enable()
    try graft.silver.TransactionsAdj(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[explain] silver: $e") }
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      println(s"===== $name =====")
      val qe = fn(spark, sfDir).queryExecution
      // execute first: under AQE the codegen-wrapped, finalized stages only
      // exist after the run (isFinalPlan=true)
      qe.toRdd.count()
      println(qe.executedPlan.treeString(verbose = false)
        .linesIterator.take(250).mkString("\n"))
    }
    spark.stop()
  }
}
