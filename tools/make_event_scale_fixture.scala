// Build an N-x-scaled EVENTS fixture from sf0.1 (spark-shell -i, with
// --driver-java-options "-DREPLICAS=n -DDST=/root/repo/bench-data/eventsN").
//
// user_id and event_id are offset per replica (N-x users, N-x events),
// timestamps unchanged: per-user session/funnel/attribution structure is
// replicated exactly, so the per-user operators' work scales linearly in
// users while windowed/hourly aggregates see N-x rows per window -- the
// two growth axes the event family must survive. Other tables are copied
// unchanged by the wrapper. (Note: Spark rewrites ts as TIMESTAMP(MICROS)
// vs the generator's NANOS -- irrelevant for the Spark-side timing study;
// the DuckDB oracle is not run at this scale.)
import org.apache.spark.sql.functions._
val src = "/root/testdata/sf0.1"
val replicas = sys.props.getOrElse("REPLICAS", "50").toInt
val dst = sys.props.getOrElse("DST", s"/root/repo/bench-data/events$replicas")
spark.sparkContext.setLogLevel("WARN")

val KU = 100000000L // user_id offset per replica
val KE = 1000000000L // event_id offset per replica

val base = spark.read.parquet(s"$src/events.parquet")
val parts = (0 until replicas).map { i =>
  base
    .withColumn("user_id", col("user_id") + lit(i * KU))
    .withColumn("event_id", col("event_id") + lit(i * KE))
}
parts.reduce(_ unionByName _)
  .repartition(32)
  .write.mode("overwrite").parquet(s"$dst/events.parquet")
println(s"[fixture] events x$replicas done -> $dst")
System.exit(0)
