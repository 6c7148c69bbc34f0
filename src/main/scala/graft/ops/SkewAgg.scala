package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation — the skew hook (SURVEY.md §4 "Shuffle/
  * spill": salting for skewed keys).
  *
  * A plain `groupBy(key).agg(sum)` sends every row of a hot key to one
  * reducer. Salting splits each key into `salt` sub-groups for the first
  * (parallel) partial aggregate, then combines the per-salt partials in a
  * second aggregate over at most `salt` rows per key. For algebraic
  * aggregates (sum/count/min/max) the result is identical — and because
  * the engine's money sums run in DECIMAL, identical bit-for-bit
  * regardless of how rows were split.
  *
  * Spark's AQE skew-join handling covers joins; this covers aggregation
  * skew, which AQE does not rebalance when a single group dominates.
  */
object SkewAgg {

  final case class SumSpec(input: String, output: String)

  def saltedSums(df: DataFrame, key: Seq[String], sums: Seq[SumSpec],
      salt: Int = 16): DataFrame = {
    // Salt from row CONTENT, not monotonically_increasing_id(): a content
    // hash assigns every row the same salt on task retry (deterministic
    // lineage), while the id-based salt depends on partition/task
    // numbering. MapType columns are excluded — Spark disallows hashing
    // maps (unordered) and would throw AnalysisException. Limitation:
    // identical duplicate rows share a salt, so a hot key whose rows are
    // near-all IDENTICAL still lands on few reducers; the aggregate stays
    // correct, only the rebalance degrades, and such inputs should be
    // pre-counted (dedup + weight) rather than salted.
    // maps are rejected by xxhash64 at ANY nesting depth (struct/array
    // elements included), not just as top-level column types
    def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => containsMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case _ => false
    }
    val hashable0 = df.schema.fields.collect {
      case f if !containsMap(f.dataType) => col(f.name)
    }.toSeq
    // Degrade gracefully when EVERY column contains a map at some depth
    // (which necessarily includes the key columns — so there is nothing
    // map-free left to hash): salt from a constant instead of letting a
    // zero-argument xxhash64() fail analysis. This disables rebalancing
    // but keeps the aggregate correct; such inputs cannot be salted by
    // content at all.
    val hashable = if (hashable0.nonEmpty) hashable0 else Seq(lit(0L))
    val salted = df.withColumn("__salt",
      pmod(xxhash64(hashable: _*), lit(salt.toLong)))
    val partial = salted
      .groupBy((key :+ "__salt").map(col): _*)
      .agg(
        sums.map(s => sum(col(s.input).cast("decimal(18,4)")).as(s.output)).head,
        sums.tail.map(s => sum(col(s.input).cast("decimal(18,4)")).as(s.output)): _*)
    partial
      .groupBy(key.map(col): _*)
      .agg(
        sums.map(s => sum(col(s.output)).cast("double").as(s.output)).head,
        sums.tail.map(s => sum(col(s.output)).cast("double").as(s.output)): _*)
  }
}
