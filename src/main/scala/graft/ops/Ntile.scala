package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global equi-depth bucketing with SQL `ntile` semantics, without the
  * single-partition window `ntile(b) OVER (ORDER BY …)` plans to — the
  * feature-discretization / cohort-binning primitive (decile scores,
  * equal-sized experiment arms) done the way a 100 TB table needs it.
  *
  * A global `ntile` requires a total order. The naive window collapses
  * the whole input into ONE task; this operator gets the same ranks from
  * a range-partitioned sort plus per-partition offsets:
  *
  *   repartitionByRange(sort key) → row_number within each partition
  *     (window PARTITIONED by `spark_partition_id()`, so every task ranks
  *     only its own slice) → add the broadcast-joined cumulative count of
  *     the partitions before it → global rank → ntile's bucket formula.
  *
  * The per-partition count table is |shuffle partitions| rows — a
  * control-table-sized frame whose own cumulative window is free — and
  * the two consumers of the range exchange (counts + ranks) reuse one
  * shuffle (ReuseExchange; the subplans are identical). The rank window
  * itself demands hash clustering on the partition id, so the plan adds
  * one more exchange — but of the already-reduced frame, moving each
  * range partition wholesale (no fan-out, no single-task collapse, the
  * thing this operator exists to avoid). Range partitioning keeps equal
  * keys on one side of each boundary, so within-partition ranks +
  * offsets compose to exactly the global `row_number`; NtileSpec pins
  * equality against the single-partition window on randomized data.
  *
  * Callers must pass a TOTAL order (break ties — e.g. append the key
  * column) or ranks at boundary duplicates would be partitioning-
  * dependent.
  */
object Ntile {

  /** Append `outCol` = the 1-based ntile bucket of each row under
    * `orderBy`, `buckets` buckets. SQL ntile semantics: first `n % b`
    * buckets get one extra row.
    */
  def global(df: DataFrame, orderBy: Seq[Column], buckets: Int,
      outCol: String = "bucket"): DataFrame = {
    require(buckets >= 1, s"Ntile.global: buckets must be >= 1, got $buckets")
    require(orderBy.nonEmpty, "Ntile.global: at least one sort column")
    // global rank = inclusive prefix count of a unit weight (RangePrefix)
    val ranked = RangePrefix.prefixSums(
      df.withColumn("__one", lit(1L)), orderBy, Seq("__one"))
      .withColumnRenamed("__one_cum", "__r")
      .withColumnRenamed("__one_tot", "__n")
    // ntile: sizeSmall = n div b, the first n % b buckets take one extra
    // row. Integral `div` (not `/`, which is double division in Spark and
    // can truncate off-by-one near 2^53) keeps the formula exact at any n.
    ranked
      .withColumn("__ss", expr(s"__n div ${buckets}L"))
      .withColumn("__nb", col("__n") % buckets.toLong)
      .withColumn("__span", col("__nb") * (col("__ss") + 1L))
      .withColumn(outCol, expr(
        """CASE WHEN __r <= __span THEN (__r - 1) div (__ss + 1)
          |ELSE __nb + (__r - __span - 1) div __ss END + 1""".stripMargin))
      .drop("__one", "__r", "__n", "__ss", "__nb", "__span")
  }
}
