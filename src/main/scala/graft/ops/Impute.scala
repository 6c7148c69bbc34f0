package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic missing-value imputation — the feature-cleaning stage
  * between ingest and training that the reference handles only as
  * blanket `fillna(0)` (`04b:210`, `04c:85`): zero is a lie for a
  * balance or a segment, so production pipelines impute from the data —
  * numeric nulls from their group's mean, categorical nulls from their
  * group's mode — and keep an audit flag per imputed cell.
  *
  * Determinism: the group mean goes through an exact DECIMAL(18,4) sum
  * (combine-order-independent) with the usual fixed double sequence +
  * 9 dp rounding at the boundary; the mode is an argmax over
  * `max(struct(count, value))` with the VALUE as tiebreak — no window
  * sort, no "whichever came first" nondeterminism. Groups that are
  * entirely null fall back to the global mean/mode (same rules).
  *
  * Scale shape: one grouped aggregate per statistic (map-side
  * combinable; the mode pre-aggregates per (group, value) first so the
  * struct-argmax shuffles value-cardinality rows, not data), broadcast
  * back onto the fact — no window over the fact, no per-group sort.
  */
object Impute {

  /** Per-group decimal-exact mean of `valueCol` (9 dp), global fallback:
    * returns (groups..., mean_value) with one extra all-null-groups row
    * handled by the caller joining with `coalesce`.
    */
  def groupMeans(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(round(
        sum(col(valueCol).cast("decimal(18,4)")).cast("double") /
          count(col(valueCol)).cast("double"), 9).as("mean_value"))

  /** Per-group mode of `valueCol` (most frequent non-null value, ties
    * broken by the smaller value — deterministic): (groups..., mode_value).
    */
  def groupModes(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    df.filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol).as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
      // argmax by (count, then LOWER value wins): negate the tiebreak by
      // using min over struct(-count, value)
      .groupBy(g: _*)
      .agg(min(struct((-col("__c")).as("nc"), col("__v").as("v")))
        .as("__best"))
      .select(g :+ col("__best.v").as("mode_value"): _*)
  }

  /** Impute numeric `numCol` (group mean → global mean) and categorical
    * `catCol` (group mode → global mode) within `groupCols`, adding
    * `<col>_imputed` audit flags. Output keeps all input columns. The
    * global statistics reuse [[groupMeans]]/[[groupModes]] with an
    * empty grouping (one definition, no drift) and enter the plan as
    * broadcast 1-row frames — no eager driver actions. A null that
    * survives every fallback (the column is ENTIRELY null, so no
    * statistic exists to impute from) fails loud at evaluation time —
    * imputation is a correctness boundary, not a place for silent
    * nulls (the HashSplit.split rule).
    */
  def meanMode(df: DataFrame, groupCols: Seq[String], numCol: String,
      catCol: String): DataFrame = {
    val means = groupMeans(df, groupCols, numCol)
    val modes = groupModes(df, groupCols, catCol)
    val gMean = groupMeans(df, Seq.empty, numCol)
      .select(col("mean_value").as("__gmean"))
    val gMode = groupModes(df, Seq.empty, catCol)
      .select(col("mode_value").as("__gmode"))
    def failArm(what: String) = raise_error(lit(
      s"Impute.meanMode: $what is entirely null — no statistic to impute from"))
    df.join(broadcast(means), groupCols, "left")
      .join(broadcast(modes), groupCols, "left")
      .crossJoin(broadcast(gMean))
      .crossJoin(broadcast(gMode))
      .withColumn(s"${numCol}_imputed", col(numCol).isNull)
      .withColumn(s"${catCol}_imputed", col(catCol).isNull)
      .withColumn(numCol,
        coalesce(col(numCol), col("mean_value"), col("__gmean"),
          failArm(numCol).cast("double")))
      .withColumn(catCol,
        coalesce(col(catCol), col("mode_value"), col("__gmode"),
          failArm(catCol).cast("string")))
      .drop("mean_value", "mode_value", "__gmean", "__gmode")
  }

  /** The md5-bucket null-injection rule (engine-identical in DuckDB via
    * [[HashSplit.bucketSql]]) used by the `impute_missing` entry to
    * exercise imputation on a fixture without natural nulls: nulls the
    * column for `perMille` of keys — drawn from the bottom of the
    * bucket range, or the top with `fromTop` (so two injections on the
    * same key can target disjoint rows). One bucket comparison → the
    * md5 evaluates once per row.
    */
  def injectNulls(c: Column, key: Column, perMille: Int,
      fromTop: Boolean = false): Column = {
    val b = HashSplit.bucket(key, 1000)
    when(if (fromTop) b >= (1000 - perMille) else b < perMille, lit(null))
      .otherwise(c)
  }
}
