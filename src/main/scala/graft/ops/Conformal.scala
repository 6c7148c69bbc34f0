package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (Vovk et al., "Algorithmic
  * Learning in a Random World"; Lei et al. 2018 JASA) — the
  * distribution-free way to put a finite-sample coverage guarantee on ANY
  * point predictor, and the modern ML-pipeline op for "ship intervals,
  * not points". Three disjoint content-hash splits: fit on TRAIN,
  * calibrate on CAL (the conformal quantile q = the
  * ⌈(n_cal+1)·(1−α)⌉-th smallest absolute residual), audit on TEST
  * (empirical coverage of ŷ ± q, guaranteed ≥ 1−α in expectation under
  * exchangeability).
  *
  * The predictor here is the per-stratum train mean — deliberately
  * simple: conformal wraps any predictor, and a closed-form one keeps
  * the whole operator engine-exact (μ and every residual are single
  * IEEE operations over exact decimal/integer casts; the rank k is pure
  * integer arithmetic; coverage comparisons are between bit-identical
  * doubles).
  *
  * Scale shape: train means are one hash aggregate broadcast back; the
  * calibration quantile is found WITHOUT a global sort-to-one-task —
  * residuals collapse to their distinct-value domain (map-combinable
  * groupBy), then the range-partitioned prefix trick (the Drift.exactKs
  * machinery) locates the k-th order statistic; the test audit is one
  * more hash aggregate.
  */
object Conformal {

  /** Split-conformal coverage audit. `units` needs (stratum, split ∈
    * train/cal/test, y money-scale); `alphaPct` ∈ (0,100) is the target
    * miscoverage in percent. Output: per-stratum test rows + `__all__`:
    * (stratum, n_test, covered, coverage, q_resid) — q_resid is the one
    * global calibration quantile (the audit column), coverage should sit
    * at or above 1−α on exchangeable data.
    *
    * Strata with NO train rows are NOT dropped: their test rows surface
    * with NULL covered/coverage (no predictor exists there), and the
    * `__all__` row counts them in n_test but not in covered — so the
    * global rate treats unpredicted units as not-covered instead of
    * overstating coverage of the full population.
    */
  def splitConformal(units: DataFrame, alphaPct: Int = 10): DataFrame = {
    require(alphaPct > 0 && alphaPct < 100,
      s"Conformal: alphaPct in (0,100), got $alphaPct")
    val mu = units.filter(col("split") === "train")
      .groupBy("stratum")
      .agg(sum(col("y").cast("decimal(18,4)")).as("sy"),
        count(lit(1)).as("n_train"))
      .select(col("stratum"),
        (col("sy").cast("double") / col("n_train").cast("double")).as("mu"))
    // LEFT join: a stratum with no train rows has no predictor — its
    // cal/test rows must SURFACE in the audit (NULL mu/r/coverage), not
    // silently vanish and overstate coverage of the full population
    val withR = units.filter(col("split") =!= "train")
      .join(broadcast(mu), Seq("stratum"), "left_outer")
      .withColumn("r", abs(col("y").cast("double") - col("mu")))

    // k-th smallest calibration residual, k = ⌈(n+1)(100−α)/100⌉, via
    // the distinct-value + range-partitioned-prefix machinery.
    // Integral div — Spark's `/` on longs is double division.
    // Train-absent strata have no residual (NULL r) and cannot enter the
    // calibration order statistic.
    val byV = withR.filter(col("split") === "cal" && col("r").isNotNull)
      .groupBy("r").agg(count(lit(1)).as("cnt"))
    val k = expr(s"((cnt_tot + 1L) * ${100 - alphaPct}L + 99L) div 100L")
    val q = RangePrefix.prefixSums(byV, Seq(col("r")), Seq("cnt"))
      .withColumn("k", k)
      .filter(col("cnt_cum") >= col("k")
        && col("cnt_cum") - col("cnt") < col("k"))
      .agg(min(col("r")).as("q_resid"))

    val test = withR.filter(col("split") === "test")
      .crossJoin(broadcast(q))
    // A NULL q_resid means k = ⌈(n_cal+1)(1−α)⌉ exceeded n_cal (a tiny
    // or empty calibration split): the conformal quantile is +∞ and the
    // interval covers EVERYTHING — count the row covered, don't let the
    // NULL comparison silently report total coverage failure. q_resid
    // itself stays NULL in the output (there is no finite quantile).
    // Per-stratum accounting: `covered` (and so `coverage`) is NULL for a
    // train-absent stratum — the machinery made NO prediction there, and a
    // NULL row in the audit is the honest surface. The `__all__` row keeps
    // integer semantics: its n_test counts EVERY test unit while covered
    // sums only predicted strata, so unpredicted rows read as not-covered
    // in the global rate rather than inflating it.
    val per = test.groupBy("stratum").agg(
      count(lit(1)).as("n_test"),
      when(max(col("mu")).isNotNull,
        sum(when(col("q_resid").isNull || col("r") <= col("q_resid"), 1L)
          .otherwise(0L))).as("covered"),
      max(col("q_resid")).as("q_resid"))
    def close(df: DataFrame) = df.select(
      col("stratum"), col("n_test"), col("covered"),
      (col("covered").cast("double") / col("n_test").cast("double"))
        .as("coverage"),
      col("q_resid"))
    close(per).unionByName(close(per.agg(
      sum(col("n_test")).as("n_test"),
      sum(col("covered")).as("covered"),
      max(col("q_resid")).as("q_resid"))
      .select(lit("__all__").as("stratum"), col("n_test"), col("covered"),
        col("q_resid"))))
  }
}
