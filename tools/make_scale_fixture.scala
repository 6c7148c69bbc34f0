// Build an N-x-scaled retail fixture from sf0.1 (spark-shell -i, with
// -DREPLICAS=n -DDST=/root/repo/bench-data/sfNr): orders/lineitem/customer
// are replicated with household/basket key offsets (n-x households,
// n-x baskets -- the grain cardinalities the feature family scales with);
// dims and the text/embedding/event tables are copied unchanged (their
// scale behavior is governed by candidate-generation bounds pinned in unit
// tests, and replicating identical docs would quadratically distort
// near-dup pair counts rather than scale them).
import org.apache.spark.sql.functions._
val src = "/root/testdata/sf0.1"
val replicas = sys.props.getOrElse("REPLICAS", "5").toInt
// name encodes base-scale x replica count (sf0.1x10), NOT a scale factor:
// "sf0.${n}r" read as a scale misleads for n >= 10
val dst = sys.props.getOrElse("DST", s"/root/repo/bench-data/sf0.1x$replicas")
spark.sparkContext.setLogLevel("WARN")

val KH = 100000000L  // custkey offset per replica (>> max c_custkey)
val KO = 1000000000L // orderkey offset per replica (>> max o_orderkey)

def rep(table: String, offsets: Map[String, Long]): Unit = {
  val base = spark.read.parquet(s"$src/$table.parquet")
  val parts = (0 until replicas).map { i =>
    offsets.foldLeft(base) { case (df, (c, k)) =>
      df.withColumn(c, col(c) + lit(i * k))
    }
  }
  parts.reduce(_ unionByName _)
    .write.mode("overwrite").parquet(s"$dst/$table.parquet")
  println(s"[fixture] $table x$replicas done")
}
rep("orders", Map("o_orderkey" -> KO, "o_custkey" -> KH))
rep("lineitem", Map("l_orderkey" -> KO))
rep("customer", Map("c_custkey" -> KH))
// dims + text/embedding/event tables: byte-identical copies (cp in the
// wrapper script -- rewriting events.parquet would change its
// TIMESTAMP_NANOS physical type)
println("[fixture] replicated tables done")
System.exit(0)
