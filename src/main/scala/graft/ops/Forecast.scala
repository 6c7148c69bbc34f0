package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holt linear-trend exponential smoothing — the demand-forecast
  * primitive (next-day spend per commodity) a propensity platform grows
  * next to the reference's classifier (which predicts WHO buys,
  * `04b_Task__Model_Training.py`; a forecaster predicts HOW MUCH and
  * WHEN — SURVEY.md §1 "not present: dedicated time-series types") — run ENTIRELY in exact
  * 1e-4 integer units, the `spend_seasonal_decompose` treatment applied
  * to a recursive statistic:
  *
  *   level_t = α·y_t + (1−α)(level_{t−1} + trend_{t−1})
  *   trend_t = β(level_t − level_{t−1}) + (1−β)·trend_{t−1}
  *
  * with α = 1/4, β = 1/8: each update is an integer linear combination
  * followed by ONE half-up (away-from-zero) division by the denominator
  * — `rndDiv` below — so the state stays a pair of exact longs and the
  * whole recursion is engine-reproducible with zero float drift. y_t
  * enters as `DECIMAL(18,4)·10⁴ → BIGINT` (exact), missing calendar
  * days as explicit zeros (the loadCompleteness spine rule), and
  * doubles appear only at the output boundary (`x/10⁴` — same IEEE
  * division of the same integers in any engine). The oracle replays the
  * recursion as a recursive CTE; hash equality proves the forecaster.
  *
  * Decomposition: the data-sized pass is the daily aggregate; the fold
  * runs on the CALENDAR-BOUNDED series table (|groups| × |days| rows —
  * the same at sf0.01 and at 100 TB) on the driver, the
  * MarkovAttribution / Survival control-table pattern.
  */
object Forecast {

  /** The driver fold is only legal on a CALENDAR-BOUNDED series table
    * (|groups| × |days|). This cap makes the contract enforced, not
    * documented: a caller passing a data-grain series (households ×
    * days) fails loudly instead of silently OOMing the driver — the
    * [[graft.dedup.Clusters.driverPairLimit]] treatment. 2M rows of
    * (key, date, 3×long) is tens of MB — far inside driver headroom,
    * far above any real (commodity/store × calendar) series.
    */
  val driverRowLimit: Long = 2000000L

  /** Half-up, away-from-zero integer division (d > 0) — written to match
    * truncating SQL integer division on the |a| form, so the same CASE
    * renders to DuckDB verbatim.
    */
  def rndDiv(a: Long, d: Long): Long = {
    val q = (2L * math.abs(a) + d) / (2L * d)
    if (a < 0) -q else q
  }

  /** The matching SQL (DuckDB `//` truncates toward zero like JVM /). */
  def rndDivSql(aExpr: String, d: Long): String =
    s"""CASE WHEN ($aExpr) >= 0 THEN (2 * ($aExpr) + $d) // ${2 * d}
       |  ELSE -((-2 * ($aExpr) + $d) // ${2 * d}) END""".stripMargin

  /** Fold Holt over `series` (groupCols, dayCol ordered, y4Col exact
    * integer units): returns groupCols, day, y4, level4, trend4 — all
    * exact longs; callers convert to doubles at their boundary.
    * `series` must be calendar-dense per group (inject zeros upstream).
    * alphaDen/betaDen are the 1/α and 1/β denominators.
    */
  def holt(series: DataFrame, groupCols: Seq[String], dayCol: String,
      y4Col: String, alphaDen: Long = 4L, betaDen: Long = 8L,
      driverLimit: Long = driverRowLimit): DataFrame = {
    require(alphaDen >= 1 && betaDen >= 1, "Forecast.holt: denominators >= 1")
    val spark = series.sparkSession
    val n = groupCols.size
    val narrowed = series.select(
      (groupCols.map(col) ++ Seq(col(dayCol), col(y4Col))): _*).cache()
    // probed cutover guard (the Clusters pattern): `limit` computes only
    // the partitions it needs, so an oversized series is detected without
    // materializing it — and the legal path shares the cached narrow frame
    val probed = narrowed
      .limit(math.min(driverLimit + 1, Int.MaxValue.toLong).toInt).count()
    require(probed <= driverLimit,
      s"Forecast.holt: series exceeds $driverLimit rows — the driver fold " +
        "is for calendar-bounded series (|groups| x |days|); aggregate to " +
        "a coarser grain first")
    val rows = try narrowed.collect() finally { narrowed.unpersist(); () }
    val folded = rows
      .map(r => (Seq.range(0, n).map(r.get),
        (r.getDate(n), r.getLong(n + 1))))
      .groupBy(_._1).toSeq
      .flatMap { case (key, grp) =>
        var lvl = 0L; var tr = 0L; var first = true
        grp.map(_._2).sortBy(_._1.getTime).map { case (day, y4) =>
          if (first) { lvl = y4; tr = 0L; first = false }
          else {
            val prev = lvl
            lvl = rndDiv(y4 + (alphaDen - 1L) * (lvl + tr), alphaDen)
            tr = rndDiv((lvl - prev) + (betaDen - 1L) * tr, betaDen)
          }
          org.apache.spark.sql.Row.fromSeq(key ++ Seq[Any](day, y4, lvl, tr))
        }
      }
    val schema = org.apache.spark.sql.types.StructType(
      groupCols.map(series.schema(_)) ++ Seq(
        org.apache.spark.sql.types.StructField(dayCol,
          org.apache.spark.sql.types.DateType, nullable = false),
        org.apache.spark.sql.types.StructField("y4",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("level4",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("trend4",
          org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(folded, 1), schema)
  }
}
