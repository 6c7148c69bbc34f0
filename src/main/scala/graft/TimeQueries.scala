package graft

/** Dev tool: time a subset of `SparkEntry.queries` by name under the same
  * session/warm-up conditions as [[Bench]] (pinned silver, registered
  * catalog, full materialization via `toRdd.count`). Repeats each query
  * `SPARK_GRAFT_REPS` times (default 2) so plan-construction vs execution
  * noise is visible while iterating on one operator without paying a full
  * bench run.
  *
  * `SPARK_GRAFT_PROFILE=1` additionally prints, per rep, the Spark jobs
  * that ran (wall clock) and the top stages by summed task time — enough
  * to tell driver-side cost (wall gap with no jobs) from executor cost,
  * and which stage of a multi-job operator dominates.
  */
object TimeQueries {

  private final class Profiler extends org.apache.spark.scheduler.SparkListener {
    import org.apache.spark.scheduler._
    import scala.collection.mutable
    final case class JobSpan(id: Int, t0: Long, var t1: Long = 0L)
    val jobs = mutable.ArrayBuffer.empty[JobSpan]
    // id, name, taskWallMs, cpuMs, gcMs, stageWallMs
    val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Long, Long, Long)]
    override def onJobStart(e: SparkListenerJobStart): Unit =
      synchronized { jobs += JobSpan(e.jobId, e.time); () }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      synchronized { jobs.find(_.id == e.jobId).foreach(_.t1 = e.time) }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      synchronized {
        val si = e.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(0L)
        val m = si.taskMetrics
        stages += ((si.stageId, si.name.linesIterator.next(),
          m.executorRunTime, m.executorCpuTime / 1000000L, m.jvmGCTime, wall))
        ()
      }
    def reportAndReset(): Unit = synchronized {
      val done = jobs.filter(_.t1 > 0)
      println(f"[prof] jobs: ${done.size}, job wall sum ${done.map(j => j.t1 - j.t0).sum / 1e3}%.2f s")
      stages.sortBy(-_._3).take(12).foreach { case (id, name, task, cpu, gc, wall) =>
        println(f"[prof]   stage $id%4d task ${task / 1e3}%7.2f s  cpu ${cpu / 1e3}%7.2f s  gc ${gc / 1e3}%6.2f s  wall ${wall / 1e3}%6.2f s  $name")
      }
      jobs.clear(); stages.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQueries <queryName> [more...]")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val profile = sys.env.get("SPARK_GRAFT_PROFILE").contains("1")
    val DevHarness.Ctx(spark, sfDir) = DevHarness.init("time")
    // Same JIT warm-up idea as Bench's suite pass, scoped to the named
    // queries: run each once against the toy fixture (same baked literals →
    // same generated-code text → same C2 targets) so isolated numbers
    // approximate the bench's warmed state. SPARK_GRAFT_WARM_DIR= disables.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
    if (warmDir.nonEmpty && warmDir != sfDir &&
        new java.io.File(warmDir).isDirectory) {
      val preSweep = spark.sparkContext.getPersistentRDDs.keySet
      try graft.core.Catalog.registerAll(spark, warmDir)
      catch { case e: Throwable => System.err.println(s"[time] warm catalog: $e") }
      try graft.silver.TransactionsAdj(spark, warmDir)
      catch { case e: Throwable => System.err.println(s"[time] warm silver: $e") }
      args.foreach { name =>
        try { DevHarness.query(name)(spark, warmDir).queryExecution.toRdd.count(); () }
        catch { case e: Throwable => System.err.println(s"[time] warm $name: $e") }
      }
      graft.core.GraftSession.sweepTransientBlocks(spark, preSweep)
      try graft.core.Catalog.registerAll(spark, sfDir)
      catch { case e: Throwable => System.err.println(s"[time] catalog: $e") }
    }
    val prof = new Profiler
    if (profile) spark.sparkContext.addSparkListener(prof)
    val pinned = spark.sparkContext.getPersistentRDDs.keySet
    args.foreach { name =>
      val fn = DevHarness.query(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        println(f"[time] $name%-32s rep$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        if (profile) {
          // listener events are posted async (the bus has no public drain);
          // a short settle keeps the report complete for a dev tool
          Thread.sleep(300)
          prof.reportAndReset()
        }
        graft.core.GraftSession.sweepTransientBlocks(spark, pinned)
      }
    }
    spark.stop()
  }
}
