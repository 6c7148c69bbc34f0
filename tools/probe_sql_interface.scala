// Probe: where do sql_interface's 8.9s go?
val sfDir = "/root/testdata/sf0.1"
spark.sparkContext.setLogLevel("WARN")
graft.core.Catalog.fixtureTables.foreach { t =>
  try { spark.read.parquet(s"$sfDir/$t.parquet").count() } catch { case _: Throwable => () }
}
graft.core.SilverStore.enable()
graft.silver.TransactionsAdj(spark, sfDir)

def time[T](tag: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[probe] $tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
}

time("registerAll (1st)") { graft.core.Catalog.registerAll(spark, sfDir) }
time("registerAll (2nd)") { graft.core.Catalog.registerAll(spark, sfDir) }
val q = """SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
  COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus"""
time("sql plan+exec (1st)") { spark.sql(q).queryExecution.toRdd.count() }
time("sql plan+exec (2nd)") { spark.sql(q).queryExecution.toRdd.count() }
time("full entry as benched") {
  graft.SparkEntry.queries("sql_interface")(spark, sfDir).queryExecution.toRdd.count()
}
System.exit(0)
