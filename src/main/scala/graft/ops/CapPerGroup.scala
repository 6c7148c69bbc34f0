package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quota capping — the dataset-curation primitive that bounds
  * any one group's contribution to a training corpus (at most N documents
  * per domain / language / source, at most N examples per label, …).
  *
  * Selection must be a pure function of content, like [[HashSplit]]: rows
  * are ranked within their group by `(md5(key), key)` and the first
  * `maxPerGroup` survive. A group's kept-set is therefore independent of
  * row order, partitioning, and time — an incremental rerun keeps exactly
  * the same rows, and membership can be verified by any engine (the
  * `cap_per_group` oracle replays the same md5 ranking in DuckDB).
  *
  * Scale shape: one hash-partition on the group key, then Spark's
  * rank-limit pushdown (`WindowGroupLimit`, pinned by CapAndTfidfSpec)
  * keeps at most `maxPerGroup` rows per group on the MAP side before the
  * exchange and again before the final sort — a hot group ships
  * `maxPerGroup` rows per upstream partition, never its full membership,
  * so group skew cannot concentrate data volume into one task.
  */
object CapPerGroup {

  /** `df` with at most `maxPerGroup` rows per value of `groupCols`,
    * selected by md5 rank of `keyCol` (ties broken by the raw key; the
    * key should be unique within a group — e.g. a document id).
    */
  def cap(df: DataFrame, groupCols: Seq[String], keyCol: String,
      maxPerGroup: Int): DataFrame = {
    require(maxPerGroup > 0, s"maxPerGroup must be positive, got $maxPerGroup")
    // NULLS LAST explicitly: Spark's ascending default is nulls-first,
    // DuckDB's is nulls-last — without the pin, null-keyed rows would
    // preferentially SURVIVE the cap here and be CUT by the oracle
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")).asc_nulls_last,
        col(keyCol).asc_nulls_last)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerGroup)
      .drop("__rn")
  }

  /** The matching DuckDB ranking expression (for oracle rendering), with
    * the same explicit NULLS LAST as the Spark window.
    */
  def rankSql(groupCols: Seq[String], keyExpr: String): String =
    s"ROW_NUMBER() OVER (PARTITION BY ${groupCols.mkString(", ")} " +
      s"ORDER BY md5(CAST($keyExpr AS VARCHAR)) NULLS LAST, $keyExpr NULLS LAST)"
}
