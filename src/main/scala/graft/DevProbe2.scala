package graft

/** Throwaway dev probe: A/B the FeatureBuilder day-fusion flag with
  * alternating executions in one JVM (mins cancel host contention).
  */
object DevProbe2 {
  def main(args: Array[String]): Unit = {
    val DevHarness.Ctx(spark, sfDir) = DevHarness.init("probe2")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("household_commodity_features", "commodity_features",
        "household_features")
    val warmDir = "/root/testdata/sf0.01"
    graft.core.Catalog.registerAll(spark, warmDir)
    graft.silver.TransactionsAdj(spark, warmDir)
    val key = "spark.graft.features.dayFusion"
    // warm both paths per query
    for (on <- Seq("true", "false"); n <- names) {
      spark.conf.set(key, on)
      DevHarness.query(n)(spark, warmDir).queryExecution.toRdd.count()
    }
    graft.core.Catalog.registerAll(spark, sfDir)
    val pinned = spark.sparkContext.getPersistentRDDs.keySet
    for (on <- Seq("true", "false"); n <- names) {
      spark.conf.set(key, on)
      DevHarness.query(n)(spark, sfDir).queryExecution.toRdd.count()
      graft.core.GraftSession.sweepTransientBlocks(spark, pinned)
    }
    val times = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    (1 to 6).foreach { _ =>
      for (on <- Seq("true", "false"); n <- names) {
        spark.conf.set(key, on)
        val t0 = System.nanoTime()
        DevHarness.query(n)(spark, sfDir).queryExecution.toRdd.count()
        val s = (System.nanoTime() - t0) / 1e9
        times((n, on)) = s :: times.getOrElse((n, on), Nil)
        graft.core.GraftSession.sweepTransientBlocks(spark, pinned)
      }
    }
    for (n <- names; on <- Seq("true", "false")) {
      val ts = times((n, on))
      println(f"[probe2] $n%-34s fusion=$on%-5s min ${ts.min}%6.2f s  all ${ts.reverse.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
