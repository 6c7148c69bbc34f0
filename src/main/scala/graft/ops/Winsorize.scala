package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group winsorization: clip a numeric column to its group's
  * [lo, hi] percentile band and flag what was clipped — the outlier
  * treatment between profiling and normalization in a feature pipeline.
  *
  * Cut points come from [[ExactPercentiles]] (sort-based order
  * statistics — no per-group value maps at any scale) and are rounded
  * to 9 decimals BEFORE comparing (the module convention), so the
  * boundaries and everything derived from them are engine-exact against
  * DuckDB's `quantile_cont`. Unclipped rows pass their value through
  * untouched (bit-exact by construction); null values stay null with
  * null flags.
  *
  * Scale shape: the percentile pass is one sort-shuffle on the group
  * key; the cut table is one row per group, joined back null-safely
  * (left join: a group whose values are all null gets null cuts and
  * passes through, mirroring the oracle's CASE semantics).
  */
object Winsorize {

  def perGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      keepCols: Seq[String], lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo <= hi,
      s"Winsorize.perGroup: need 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val cuts = ExactPercentiles
      .perGroup(df, groupCols, valueCol, Seq("__plo" -> lo, "__phi" -> hi))
      .select(groupCols.map(col) :+
        round(col("__plo"), 9).as("__plo") :+
        round(col("__phi"), 9).as("__phi"): _*)
    val left = df.select((keepCols ++ groupCols).map(col) :+
      col(valueCol).cast("double").as("value"): _*)
    val v = col("value")
    GroupKeys.joinOn(left, cuts, groupCols, "left_outer").select(
      keepCols.map(left(_)) ++ groupCols.map(left(_)) ++ Seq(
        v,
        when(v < col("__plo"), col("__plo"))
          .when(v > col("__phi"), col("__phi"))
          .otherwise(v).as("value_clipped"),
        (v < col("__plo")).as("clipped_low"),
        (v > col("__phi")).as("clipped_high")): _*)
  }

  /** The same clip as DuckDB SQL (oracle rendering), single group column. */
  def perGroupSql(table: String, groupCol: String, valueCol: String,
      keepCols: Seq[String], lo: Double = 0.05, hi: Double = 0.95): String = {
    val keeps = keepCols.map("d." + _).mkString(", ")
    s"""WITH cuts AS (
       |  SELECT $groupCol,
       |    round(quantile_cont(CAST($valueCol AS DOUBLE), $lo), 9) AS plo,
       |    round(quantile_cont(CAST($valueCol AS DOUBLE), $hi), 9) AS phi
       |  FROM $table GROUP BY $groupCol)
       |SELECT $keeps, d.$groupCol,
       |  CAST(d.$valueCol AS DOUBLE) AS value,
       |  CASE WHEN CAST(d.$valueCol AS DOUBLE) < c.plo THEN c.plo
       |       WHEN CAST(d.$valueCol AS DOUBLE) > c.phi THEN c.phi
       |       ELSE CAST(d.$valueCol AS DOUBLE) END AS value_clipped,
       |  CAST(d.$valueCol AS DOUBLE) < c.plo AS clipped_low,
       |  CAST(d.$valueCol AS DOUBLE) > c.phi AS clipped_high
       |FROM $table d LEFT JOIN cuts c
       |  ON d.$groupCol IS NOT DISTINCT FROM c.$groupCol""".stripMargin
  }
}
