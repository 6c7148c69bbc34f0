package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketches from fixed-width histogram partials — the
  * quantile sibling of the HLL distinct pattern (`sketch_distinct_merge`):
  * store a tiny per-day summary instead of the fact, merge any date window
  * at read time, never rescan history.
  *
  *   fact (day's data) ──groupBy (group, day, bin)──▶ daily partials (KB)
  *   partials (any window) ──sum per (group, bin)──▶ merged histogram
  *   merged histogram ──cumulative ranks + interpolation──▶ quantiles
  *
  * Unlike t-digest/KLL sketches, a fixed-width histogram is fully
  * deterministic — merge order, partitioning, and engine cannot change a
  * single count — so the whole chain is DuckDB-oracle-verifiable, and the
  * estimation error is transparent: at most `binWidth` (the estimate
  * interpolates inside the covering bin under a uniform-within-bin
  * assumption). Choose `binWidth` from the domain (e.g. cents for money)
  * exactly as you would choose a sketch's compression parameter.
  *
  * Scale shape: partials are one hash aggregation over the day's data
  * (map-side combinable; output rows = groups × occupied bins, KBs);
  * the merge + quantile estimation runs entirely on partials — windows
  * sort bins per group (bounded by value range / binWidth, not by data).
  */
object QuantileSketch {

  /** Per-(group, day, bin) row counts; `bin = floor(value / binWidth)`
    * (nulls dropped — a null has no magnitude, matching what exact
    * `percentile`/`quantile_cont` ignore).
    */
  def dailyPartials(df: DataFrame, groupCols: Seq[String], dayCol: String,
      valueCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ dayCol).map(col) :+
        floor(col(valueCol) / binWidth).cast("long").as("bin"): _*)
      .agg(count(lit(1)).as("bin_rows"))
  }

  /** Merge partials (any subset of days) and estimate quantiles.
    *
    * Rank convention matches `quantile_cont`'s position arithmetic:
    * target position `(n−1)·p`; the covering bin is the one whose
    * cumulative count first exceeds it; the estimate interpolates
    * linearly inside that bin:
    * `bin·w + w·(pos − cumBefore)/binRows`, rounded to 9 decimals.
    * Every input to that expression is an exact integer (counts) or a
    * pinned-association double — engine-bit-identical.
    */
  def quantiles(partials: DataFrame, groupCols: Seq[String],
      binWidth: Double, ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "quantiles: at least one percentile")
    val gs = groupCols.map(col)
    val merged = partials
      .groupBy(gs :+ col("bin"): _*)
      .agg(sum(col("bin_rows")).as("cnt"))
    val byBin = Window.partitionBy(gs: _*).orderBy(col("bin"))
    val whole = Window.partitionBy(gs: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = merged
      .withColumn("cum", sum(col("cnt")).over(byBin))
      .withColumn("n", sum(col("cnt")).over(whole))
    def pos(p: Double) = (col("n") - 1L).cast("double") * lit(p)
    val picks = ps.map { case (nm, p) =>
      // exactly one bin satisfies cumBefore <= pos < cum (cnt > 0 rows
      // only exist for occupied bins; pos <= n-1 < last cum)
      min(when(
        (col("cum") - col("cnt")).cast("double") <= pos(p) &&
          pos(p) < col("cum").cast("double"),
        round(col("bin").cast("double") * binWidth +
          lit(binWidth) * (pos(p) - (col("cum") - col("cnt")).cast("double")) /
            col("cnt").cast("double"), 9))).as(nm)
    }
    cum.groupBy(gs: _*)
      .agg(max(col("n")).as("n"), picks: _*)
      .select(gs ++ (col("n") +: ps.map(p => col(p._1))): _*)
  }

  /** The matching DuckDB SQL, as a full SELECT over a relation `rel`
    * with columns `groupCols ++ (bin, bin_rows)` (i.e. the partials).
    */
  def quantilesSql(rel: String, groupCols: Seq[String], binWidth: Double,
      ps: Seq[(String, Double)]): String = {
    val g = groupCols.mkString(", ")
    val posE = (p: Double) => s"CAST(n - 1 AS DOUBLE) * $p"
    val picks = ps.map { case (nm, p) =>
      s"""MIN(CASE WHEN CAST(cum - cnt AS DOUBLE) <= ${posE(p)}
         |  AND ${posE(p)} < CAST(cum AS DOUBLE)
         |  THEN round(CAST(bin AS DOUBLE) * $binWidth +
         |    $binWidth * (${posE(p)} - CAST(cum - cnt AS DOUBLE)) /
         |      CAST(cnt AS DOUBLE), 9) END) AS $nm""".stripMargin
    }.mkString(",\n")
    s"""SELECT $g, MAX(n) AS n,
       |$picks
       |FROM (
       |  SELECT $g, bin, cnt,
       |    CAST(SUM(cnt) OVER (PARTITION BY $g ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(SUM(cnt) OVER (PARTITION BY $g) AS BIGINT) AS n
       |  FROM (
       |    SELECT $g, bin, CAST(SUM(bin_rows) AS BIGINT) AS cnt
       |    FROM $rel GROUP BY $g, bin))
       |GROUP BY $g""".stripMargin
  }
}
