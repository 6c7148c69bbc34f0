package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift statistics between two slices of a dataset — the
  * monitoring pass a production scoring pipeline runs on every batch
  * (did this week's spend/score distribution move against the training
  * baseline?). Complements the row-level gates ([[Expectations]],
  * [[SnapshotDiff]]) with the two standard distribution tests:
  *
  *  - **PSI** (population stability index): Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ) over
  *    fixed-width value bins; the industry alert thresholds are 0.1
  *    (drifting) / 0.25 (major shift).
  *  - **KS statistic**: max |CDF_a − CDF_b| over the same bins (the
  *    binned Kolmogorov-Smirnov distance — exact if bin edges are, as
  *    here, shared by both sides).
  *
  * Scale shape: ONE hash aggregation over the data per side — per
  * (group, bin) counts with map-side combine — then all ratio/log/cdf
  * arithmetic runs on the tiny bin table (window over bins per group,
  * bounded by value range / binWidth). Counts are exact integers; every
  * double expression has pinned association and rounds to 9 decimals,
  * so both statistics are engine-exact and DuckDB-oracle-verifiable.
  *
  * Empty-bin convention: PSI's log diverges on zero probabilities, so
  * both sides are Laplace-smoothed — (count + 1) / (n + bins) — the
  * textbook fix, applied identically in the oracle.
  */
object Drift {

  /** Per-group PSI + KS between the rows matching `isBaseline` and the
    * rest. Output: group cols, baseline_rows, current_rows, psi, ks.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      isBaseline: Column, binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val binned = df
      .filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+
        floor(col(valueCol) / binWidth).cast("long").as("bin"): _*)
      .agg(
        sum(when(isBaseline, 1L).otherwise(0L)).as("a"),
        sum(when(isBaseline, 0L).otherwise(1L)).as("b"))
    fromBins(binned, groupCols)
  }

  /** The statistics stage alone, over pre-binned per-(group, bin) counts
    * (`a` = baseline rows, `b` = current rows). Separated so incremental
    * maintainers ([[graft.streaming.DriftMonitor]]) can feed STORED bin
    * tables — the whole point of binned drift is that the monitor never
    * rescans either side's raw data.
    */
  def fromBins(binned: DataFrame, groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    val whole = Window.partitionBy(gs: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byBin = Window.partitionBy(gs: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withTotals = binned
      .withColumn("na", sum(col("a")).over(whole))
      .withColumn("nb", sum(col("b")).over(whole))
      .withColumn("nbins", count(lit(1)).over(whole))
      .withColumn("cum_a", sum(col("a")).over(byBin))
      .withColumn("cum_b", sum(col("b")).over(byBin))
    // Laplace-smoothed probabilities: (cnt+1)/(n+bins) — exact-integer
    // numerators/denominators, one double division each
    val pa = (col("a") + 1L).cast("double") /
      (col("na") + col("nbins")).cast("double")
    val pb = (col("b") + 1L).cast("double") /
      (col("nb") + col("nbins")).cast("double")
    // ln is transcendental (last-ulp varies by libm): each term goes
    // through DECIMAL(18,9) before the sum — the lm_score convention —
    // so the total is combine-order independent and engine-exact to 9 dp;
    // the KS gap rounds per bin before the (order-free) max, like pairCos
    withTotals
      .select(gs ++ Seq(
        col("a"), col("b"), col("na"), col("nb"),
        ((pa - pb) * log(pa / pb)).cast("decimal(18,9)").as("psi_term"),
        round(abs(col("cum_a").cast("double") / col("na").cast("double") -
          col("cum_b").cast("double") / col("nb").cast("double")), 9)
          .as("cdf_gap")): _*)
      .groupBy(gs: _*)
      .agg(
        max(col("na")).as("baseline_rows"),
        max(col("nb")).as("current_rows"),
        round(sum(col("psi_term")).cast("double"), 6).as("psi"),
        max(col("cdf_gap")).as("ks"))
  }

  /** EXACT two-sample Kolmogorov-Smirnov statistic — the unbinned
    * companion to [[perGroup]]'s binned KS: sup over the pooled sample of
    * |F_a(v) − F_b(v)|, evaluated at every distinct value, with the
    * maximizing value reported. The sup of an ECDF difference is attained
    * at a sample point, so "every distinct value" IS exact.
    *
    * Integer-exact throughout: the gap at value v is
    * |c_a(v)·n_b − c_b(v)·n_a| (cross-multiplied cumulative counts, exact
    * int128 via DECIMAL(19,0) products); the statistic is the max gap
    * divided ONCE by n_a·n_b. No double accumulates, so the result is
    * engine-bit-exact.
    *
    * Scale shape: a map-combinable groupBy collapses the data to its
    * distinct-value domain; the cumulative counts then come from the
    * [[Ntile]] trick — repartitionByRange over values, per-partition
    * prefix sums (window partitioned by `spark_partition_id`), plus
    * broadcast per-partition offsets — so no single-task global window
    * ever sees the value table.
    *
    * Output: ONE row (n_a, n_b, ks, ks_at) — ks_at is the smallest value
    * attaining the sup (deterministic tie-break).
    */
  def exactKs(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val byValue = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("decimal(18,4)").as("v"))
      .agg(
        sum(when(isA, 1L).otherwise(0L)).as("a"),
        sum(when(isA, 0L).otherwise(1L)).as("b"))
    // distributed prefix over the distinct-value domain (RangePrefix)
    val gaps = RangePrefix.prefixSums(byValue, Seq(col("v")), Seq("a", "b"))
      .select(col("v"), col("a_tot").as("n_a"), col("b_tot").as("n_b"),
        abs(col("a_cum").cast("decimal(19,0)")
            * col("b_tot").cast("decimal(19,0)")
          - col("b_cum").cast("decimal(19,0)")
            * col("a_tot").cast("decimal(19,0)")).as("gap"))
    val maxGap = gaps.agg(max(col("gap")).as("mg"))
    gaps.join(broadcast(maxGap), col("gap") === col("mg"))
      .agg(
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("gap")).as("gap"), min(col("v")).as("ks_at"))
      .select(col("n_a"), col("n_b"),
        // one division over exact int128 casts — engine-exact unrounded.
        // NULLIF: an empty sample (every row on one side of the split)
        // makes n_a·n_b = 0 — NULL statistic, not an ANSI abort.
        (col("gap").cast("double")
          / nullif((col("n_a").cast("decimal(19,0)")
            * col("n_b").cast("decimal(19,0)")).cast("double"), lit(0.0)))
          .as("ks"),
        col("ks_at").cast("double").as("ks_at"))
  }

  /** The matching DuckDB SQL over relation `rel` (must expose groupCols,
    * a `v` value column, and an `is_base` boolean).
    */
  def perGroupSql(rel: String, groupCols: Seq[String],
      binWidth: Double): String = {
    val g = groupCols.mkString(", ")
    s"""SELECT $g,
       |  MAX(na) AS baseline_rows, MAX(nb) AS current_rows,
       |  round(CAST(SUM(CAST((pa - pb) * ln(pa / pb) AS DECIMAL(18,9)))
       |    AS DOUBLE), 6) AS psi,
       |  MAX(round(abs(CAST(cum_a AS DOUBLE) / CAST(na AS DOUBLE)
       |    - CAST(cum_b AS DOUBLE) / CAST(nb AS DOUBLE)), 9)) AS ks
       |FROM (
       |  SELECT $g, a, b, na, nb, cum_a, cum_b,
       |    CAST(a + 1 AS DOUBLE) / CAST(na + nbins AS DOUBLE) AS pa,
       |    CAST(b + 1 AS DOUBLE) / CAST(nb + nbins AS DOUBLE) AS pb
       |  FROM (
       |    SELECT $g, bin, a, b,
       |      CAST(SUM(a) OVER (PARTITION BY $g) AS BIGINT) AS na,
       |      CAST(SUM(b) OVER (PARTITION BY $g) AS BIGINT) AS nb,
       |      COUNT(*) OVER (PARTITION BY $g) AS nbins,
       |      CAST(SUM(a) OVER (PARTITION BY $g ORDER BY bin
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |        AS cum_a,
       |      CAST(SUM(b) OVER (PARTITION BY $g ORDER BY bin
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |        AS cum_b
       |    FROM (
       |      SELECT $g, CAST(FLOOR(v / $binWidth) AS BIGINT) AS bin,
       |        CAST(SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |        CAST(SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS b
       |      FROM $rel WHERE v IS NOT NULL
       |      GROUP BY $g, CAST(FLOOR(v / $binWidth) AS BIGINT))))
       |GROUP BY $g""".stripMargin
  }
}
