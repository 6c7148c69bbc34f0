package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group feature normalization: z-score and min-max scaling of a
  * numeric column within each group — the feature-engineering step
  * between aggregation and training.
  *
  * Engine-exact by construction: values are truncated to DECIMAL(18,4)
  * once, and every statistic is either an exact decimal aggregate
  * (count / sum / sum-of-squares / min / max — addition order cannot
  * perturb them) or a FIXED sequence of double operations on those exact
  * inputs (`mean = s/n`, `var = (sq - s*s/n)/(n-1)`, one sqrt, one
  * divide), rounded to 9 decimals at the end — the module-wide
  * convention (cosines, tf-idf), so the DuckDB oracle reproduces every
  * bit. Degenerate groups yield NULL rather than ±Inf/NaN: z needs
  * n > 1 and positive variance, min-max needs max > min.
  *
  * Scale shape: one grouped aggregation (map-side partial — 5 plain
  * aggregates, no distinct, no Expand) producing a stats table with one
  * row per group, joined back on the group key. Catalyst/AQE broadcasts
  * the stats side when small (the common case — group cardinality ≪
  * rows); a pathological group count degrades to a sort-merge join on
  * the key, still one shuffle of stats, never of moments per row.
  */
object Normalize {

  def perGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      keepCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "Normalize.perGroup: need group columns")
    val v4 = col(valueCol).cast("decimal(18,4)")
    val stats = df.groupBy(groupCols.map(col): _*).agg(
      count(v4).as("__n"),
      sum(v4).as("__s"),
      sum(v4 * v4).as("__sq"),
      min(v4).as("__mn"),
      max(v4).as("__mx"))
    val nD = col("__n").cast("double")
    val sD = col("__s").cast("double")
    val sqD = col("__sq").cast("double")
    val vD = col("__v4").cast("double")
    val mean = sD / nD
    val variance = (sqD - sD * sD / nD) / (nD - lit(1.0))
    val z = when(col("__n") > 1 && variance > 0.0,
      round((vD - mean) / sqrt(variance), 9))
    val mm = when(col("__mx") > col("__mn"),
      round((col("__v4") - col("__mn")).cast("double") /
        (col("__mx") - col("__mn")).cast("double"), 9))
    val left = df.select((keepCols ++ groupCols).map(col) :+ v4.as("__v4"): _*)
    val out: Seq[Column] =
      keepCols.map(left(_)) ++ groupCols.map(left(_)) :+
        vD.as("value") :+ z.as("value_z") :+ mm.as("value_minmax")
    GroupKeys.joinOn(left, stats, groupCols).select(out: _*)
  }

  /** The identical arithmetic as DuckDB SQL (oracle rendering) for a
    * single group column. `table` must expose `groupCol`, `valueCol`,
    * and the `keepCols`.
    */
  def perGroupSql(table: String, groupCol: String, valueCol: String,
      keepCols: Seq[String]): String = {
    val keeps = keepCols.map("d." + _).mkString(", ")
    s"""WITH v AS (
       |  SELECT *, CAST($valueCol AS DECIMAL(18,4)) AS v4 FROM $table
       |), stats AS (
       |  SELECT $groupCol, COUNT(v4) AS n, SUM(v4) AS s,
       |    SUM(v4 * v4) AS sq, MIN(v4) AS mn, MAX(v4) AS mx
       |  FROM v GROUP BY $groupCol)
       |SELECT $keeps, d.$groupCol,
       |  CAST(d.v4 AS DOUBLE) AS value,
       |  CASE WHEN t.n > 1 AND
       |      (CAST(t.sq AS DOUBLE) - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE)
       |        / CAST(t.n AS DOUBLE)) / (CAST(t.n AS DOUBLE) - 1.0) > 0.0
       |    THEN round((CAST(d.v4 AS DOUBLE)
       |        - CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
       |      / sqrt((CAST(t.sq AS DOUBLE)
       |        - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
       |        / (CAST(t.n AS DOUBLE) - 1.0)), 9)
       |  END AS value_z,
       |  CASE WHEN t.mx > t.mn
       |    THEN round(CAST(d.v4 - t.mn AS DOUBLE) / CAST(t.mx - t.mn AS DOUBLE), 9)
       |  END AS value_minmax
       |FROM v d JOIN stats t ON d.$groupCol IS NOT DISTINCT FROM t.$groupCol""".stripMargin
  }
}
