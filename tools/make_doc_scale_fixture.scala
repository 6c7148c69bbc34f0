// Build an N-x-scaled DOCUMENTS fixture from sf0.1 (spark-shell -i, with
// --driver-java-options "-DREPLICAS=n -DDST=/root/repo/bench-data/docsN").
//
// Byte-identical replication would distort near-dup structure
// quadratically (every copy of doc A is a near-dup of every other copy),
// so each replica gets a TOKEN-LEVEL transform: every whitespace token is
// suffixed with the replica tag. Within a replica, two docs share a
// shingle iff they shared it originally -- the dup/near-dup pair
// population scales exactly linearly (xN) -- while across replicas no
// shingle ever matches (disjoint token vocabularies). doc_id is offset
// per replica. Other tables are copied unchanged by the wrapper (the doc
// queries under study never read them at scale).
import org.apache.spark.sql.functions._
val src = "/root/testdata/sf0.1"
val replicas = sys.props.getOrElse("REPLICAS", "50").toInt
val dst = sys.props.getOrElse("DST", s"/root/repo/bench-data/docs$replicas")
spark.sparkContext.setLogLevel("WARN")

val KD = 100000000L // doc_id offset per replica (>> max doc_id)

val base = spark.read.parquet(s"$src/documents.parquet")
val parts = (0 until replicas).map { i =>
  base
    .withColumn("doc_id", col("doc_id") + lit(i * KD))
    .withColumn("text",
      array_join(transform(split(col("text"), " "),
        w => concat(w, lit(s"~r$i"))), " "))
}
parts.reduce(_ unionByName _)
  .repartition(32)
  .write.mode("overwrite").parquet(s"$dst/documents.parquet")
println(s"[fixture] documents x$replicas done -> $dst")
System.exit(0)
