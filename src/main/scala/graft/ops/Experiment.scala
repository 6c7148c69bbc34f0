package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B-experiment readout with CUPED variance reduction (Deng et al.,
  * "Improving the Sensitivity of Online Controlled Experiments by Utilizing
  * Pre-Experiment Data", WSDM 2013) — the standard industrial estimator:
  * adjust each unit's experiment-period metric `y` by its pre-period
  * covariate `x`,
  *
  *   y_cuped = y - theta * (x - mean(x)),   theta = cov(x, y) / var(x)
  *
  * pooled over all arms, which shrinks the arm-mean variance by the
  * squared x/y correlation without biasing the treatment effect (x
  * predates assignment, so E[x | arm] is constant).
  *
  * Scale shape: everything reduces to FIVE grand totals (n, Σx, Σy, Σxy,
  * Σx²) plus the same per arm — one map-side-combinable hash aggregate
  * pass each, no window, no per-unit second pass: theta is applied to the
  * ARM AGGREGATES algebraically (mean of y−θ(x−μ) = mean_y − θ(mean_x−μ)),
  * so the unit table is never re-scanned. Sums accumulate as DECIMAL
  * (inputs quantized to 4 dp; products exact at scale 8), so every total
  * is combine-order independent and the closing double arithmetic — the
  * same association on both engines — is bit-identical.
  */
object Experiment {

  /** Per-arm CUPED readout. `df` needs columns `arm` (string), `x`, `y`
    * (numeric, money-scale). Output: one row per arm with raw and
    * adjusted means, plus the pooled theta for audit.
    */
  def cuped(df: DataFrame): DataFrame = {
    val dx = col("x").cast("decimal(18,4)")
    val dy = col("y").cast("decimal(18,4)")
    val q = df.select(col("arm"), dx.as("x"), dy.as("y"))
    val pooled = q.agg(
      count(lit(1)).as("n_all"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    // theta and mu_x from exact decimal totals, closed in double with a
    // fixed association: cov = sxy/n - (sx/n)*(sy/n); var likewise.
    val thetaCols = pooled.select(
      col("n_all"),
      (col("sx").cast("double") / col("n_all").cast("double")).as("mu_x"),
      ((col("sxy").cast("double") / col("n_all").cast("double"))
        - (col("sx").cast("double") / col("n_all").cast("double"))
          * (col("sy").cast("double") / col("n_all").cast("double"))).as("cov_xy"),
      ((col("sxx").cast("double") / col("n_all").cast("double"))
        - (col("sx").cast("double") / col("n_all").cast("double"))
          * (col("sx").cast("double") / col("n_all").cast("double"))).as("var_x"))
      .select(col("mu_x"), (col("cov_xy") / col("var_x")).as("theta"))
    val arms = q.groupBy("arm").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("asx"), sum(col("y")).as("asy"))
    arms.crossJoin(broadcast(thetaCols))
      .select(
        col("arm"), col("n"),
        round(col("asy").cast("double") / col("n").cast("double"), 9)
          .as("mean_y"),
        round(col("asx").cast("double") / col("n").cast("double"), 9)
          .as("mean_x"),
        round((col("asy").cast("double") / col("n").cast("double"))
          - col("theta")
            * ((col("asx").cast("double") / col("n").cast("double"))
              - col("mu_x")), 9).as("mean_y_cuped"),
        round(col("theta"), 9).as("theta"))
  }

  /** Two-proportion experiment readout: pooled z statistic, per-arm
    * Wilson score intervals (the CI that behaves at small n and extreme
    * rates, unlike the Wald interval), and the minimum detectable effect
    * at the same design — the conversion-rate significance test that
    * complements [[cuped]]'s continuous-metric readout.
    *
    * Input: one row per unit with `arm` ('control'/'treatment') and
    * `converted` (0/1). Output: ONE row with counts, rates, diff, the
    * pooled z, Wilson bounds per arm (z = 1.96), and the two-sided
    * MDE at α = 0.05, power = 0.80 (z_α/2 + z_β = 1.96 + 0.8416).
    *
    * Scale shape: one map-side-combinable aggregate producing four
    * integers; every statistic closes from those with pinned-association
    * IEEE arithmetic (divisions and correctly-rounded sqrt only — no
    * transcendental, no rounding step), so the row is engine-bit-exact.
    */
  def proportionTest(df: DataFrame): DataFrame = {
    val t = when(col("arm") === "treatment", 1L).otherwise(0L)
    val c = col("converted").cast("long")
    val m = df.agg(
      sum(lit(1L) - t).as("n_c"), sum(t).as("n_t"),
      sum((lit(1L) - t) * c).as("conv_c"), sum(t * c).as("conv_t"))
    // Degenerate-margin guards: an empty arm (n=0) or a pooled rate of
    // exactly 0 or 1 would divide by zero — a query-killing error under
    // ANSI mode (and engine-divergent inf/NaN without it). NULL-valued
    // statistics instead, like the chi2 screen's convention; the oracle
    // SQL mirrors with NULLIF.
    val nC = nullif(col("n_c").cast("double"), lit(0.0))
    val nT = nullif(col("n_t").cast("double"), lit(0.0))
    val pC = col("conv_c").cast("double") / nC
    val pT = col("conv_t").cast("double") / nT
    val pPool = (col("conv_c") + col("conv_t")).cast("double") /
      nullif((col("n_c") + col("n_t")).cast("double"), lit(0.0))
    val invN = lit(1.0) / nC + lit(1.0) / nT
    val z = lit(1.96)
    def wilson(p: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column, sign: Double) =
      (p + z * z / (lit(2.0) * n)
        + lit(sign) * z * sqrt(p * (lit(1.0) - p) / n
          + z * z / (lit(4.0) * n * n))) / (lit(1.0) + z * z / n)
    m.select(
      col("n_c"), col("n_t"), col("conv_c"), col("conv_t"),
      pC.as("p_ctrl"), pT.as("p_treat"), (pT - pC).as("diff"),
      ((pT - pC) / nullif(sqrt(pPool * (lit(1.0) - pPool) * invN), lit(0.0)))
        .as("z_stat"),
      wilson(pC, nC, -1.0).as("ctrl_lo"), wilson(pC, nC, 1.0).as("ctrl_hi"),
      wilson(pT, nT, -1.0).as("treat_lo"), wilson(pT, nT, 1.0).as("treat_hi"),
      // MDE: (z_α/2 + z_β) · √(p̄(1−p̄)·(1/n_c + 1/n_t))
      (lit(1.96 + 0.8416) * sqrt(pPool * (lit(1.0) - pPool) * invN))
        .as("mde"))
  }

  /** The matching DuckDB closing SQL over a relation exposing
    * (n_c, n_t, conv_c, conv_t) — identical association step for step.
    */
  def proportionTestSql(rel: String): String = {
    def w(p: String, n: String, sign: String) =
      s"""($p + 1.96 * 1.96 / (2.0 * $n)
         | $sign 1.96 * SQRT($p * (1.0 - $p) / $n
         |   + 1.96 * 1.96 / (4.0 * $n * $n))) / (1.0 + 1.96 * 1.96 / $n)"""
        .stripMargin.replaceAll("\n", "")
    s"""SELECT n_c, n_t, conv_c, conv_t, p_c AS p_ctrl, p_t AS p_treat,
       |  p_t - p_c AS diff,
       |  (p_t - p_c) / NULLIF(SQRT(pp * (1.0 - pp) * inv_n), 0) AS z_stat,
       |  ${w("p_c", "nc", "-")} AS ctrl_lo,
       |  ${w("p_c", "nc", "+")} AS ctrl_hi,
       |  ${w("p_t", "nt", "-")} AS treat_lo,
       |  ${w("p_t", "nt", "+")} AS treat_hi,
       |  (1.96 + 0.8416) * SQRT(pp * (1.0 - pp) * inv_n) AS mde
       |FROM (
       |  SELECT n_c, n_t, conv_c, conv_t,
       |    NULLIF(CAST(n_c AS DOUBLE), 0) AS nc,
       |    NULLIF(CAST(n_t AS DOUBLE), 0) AS nt,
       |    CAST(conv_c AS DOUBLE) / NULLIF(CAST(n_c AS DOUBLE), 0) AS p_c,
       |    CAST(conv_t AS DOUBLE) / NULLIF(CAST(n_t AS DOUBLE), 0) AS p_t,
       |    CAST(conv_c + conv_t AS DOUBLE)
       |      / NULLIF(CAST(n_c + n_t AS DOUBLE), 0) AS pp,
       |    1.0 / NULLIF(CAST(n_c AS DOUBLE), 0)
       |      + 1.0 / NULLIF(CAST(n_t AS DOUBLE), 0) AS inv_n
       |  FROM $rel)""".stripMargin
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 test + the Mantel–Haenszel
    * pooled odds ratio — the Simpson's-paradox-safe experiment readout:
    * when the arm mix differs across strata (store formats, cohorts), the
    * pooled 2×2 table ([[proportionTest]]) can show an effect that is an
    * artifact of composition; CMH tests the treatment association WITHIN
    * strata and pools the evidence (Mantel & Haenszel 1959).
    *
    * Per stratum k with cells a (treated-converted), b, c, d and
    * n = a+b+c+d:  E_k = n_t·(a+c)/n,  V_k = n_t·n_c·(a+c)·(b+d)/(n²(n−1)),
    * χ²_CMH = (Σa − ΣE)² / ΣV (uncorrected), OR_MH = Σ(ad/n) / Σ(bc/n).
    *
    * Determinism: the per-stratum cells are exact integers; E/V/R/S are
    * fixed IEEE sequences over them, quantized to integer 1e-9 units
    * (round → DECIMAL(38,0), the AnomalyMonitor v4 rule) BEFORE the
    * cross-strata sums so the totals are combine-order independent and
    * scale-0 casts single-round on both engines; the closing arithmetic
    * is two divisions. Quantization at 9 dp is audit-exact for
    * stratum-count magnitudes up to ~1e5 (beyond that the statistic is
    * double-precision anyway). Strata with n < 2 have undefined V and
    * are EXCLUDED from the sums, surfaced via n_strata_used.
    *
    * Scale shape: one map-side-combinable aggregate to the stratum cell
    * table, then one aggregate over it — no window, no join, no collect.
    * Input: (stratum, arm ∈ control/treatment, converted 0/1).
    */
  def cmhStratified(df: DataFrame): DataFrame = {
    val t = when(col("arm") === "treatment", 1L).otherwise(0L)
    val cv = col("converted").cast("long")
    val cells = df.groupBy("stratum").agg(
        sum(t).as("n_t"), sum(lit(1L) - t).as("n_c"),
        sum(t * cv).as("a"), sum((lit(1L) - t) * cv).as("c2"))
      .withColumn("b", col("n_t") - col("a"))
      .withColumn("d", col("n_c") - col("c2"))
      .withColumn("n", col("n_t") + col("n_c"))
    def dbl(x: org.apache.spark.sql.Column) = x.cast("double")
    val m1 = dbl(col("a") + col("c2"))
    val m0 = dbl(col("b") + col("d"))
    val nD = dbl(col("n"))
    val e = dbl(col("n_t")) * m1 / nD
    val v = dbl(col("n_t")) * dbl(col("n_c")) * m1 * m0 /
      (nD * nD * dbl(col("n") - 1))
    val r = dbl(col("a")) * dbl(col("d")) / nD
    val s2 = dbl(col("b")) * dbl(col("c2")) / nD
    // integer 1e-9 units BEFORE the sum: order-free exact totals,
    // scale-0 decimal→double single-rounds identically on both engines
    def q9(x: org.apache.spark.sql.Column) =
      round(x * lit(1.0e9)).cast("decimal(38,0)")
    val ok = col("n") >= 2
    val agg = cells.agg(
      count(lit(1)).as("n_strata"),
      sum(when(ok, 1L).otherwise(0L)).as("n_strata_used"),
      sum(when(ok, col("a"))).as("sum_a"),
      sum(when(ok, q9(e))).as("__se"),
      sum(when(ok, q9(v))).as("__sv"),
      sum(when(ok, q9(r))).as("__sr"),
      sum(when(ok, q9(s2))).as("__ss"))
    val se = agg("__se").cast("double") / lit(1.0e9)
    val sv = agg("__sv").cast("double") / lit(1.0e9)
    val dev = col("sum_a").cast("double") - se
    agg.select(
      col("n_strata"), col("n_strata_used"), col("sum_a"),
      se.as("expected_a"),
      (dev * dev / nullif(sv, lit(0.0))).as("cmh_chi2"),
      ((agg("__sr").cast("double") / lit(1.0e9)) /
        nullif(agg("__ss").cast("double") / lit(1.0e9), lit(0.0)))
        .as("or_mh"))
  }

  /** The matching DuckDB closing SQL over a relation exposing
    * (stratum, arm, converted) — identical association step for step.
    */
  def cmhStratifiedSql(rel: String): String =
    s"""SELECT n_strata, n_strata_used, sum_a,
       |  CAST(se AS DOUBLE) / 1000000000.0 AS expected_a,
       |  (CAST(sum_a AS DOUBLE) - CAST(se AS DOUBLE) / 1000000000.0)
       |    * (CAST(sum_a AS DOUBLE) - CAST(se AS DOUBLE) / 1000000000.0)
       |    / NULLIF(CAST(sv AS DOUBLE) / 1000000000.0, 0) AS cmh_chi2,
       |  (CAST(sr AS DOUBLE) / 1000000000.0)
       |    / NULLIF(CAST(ss AS DOUBLE) / 1000000000.0, 0) AS or_mh
       |FROM (
       |  SELECT COUNT(*) AS n_strata,
       |    CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_strata_used,
       |    CAST(SUM(CASE WHEN n >= 2 THEN a END) AS BIGINT) AS sum_a,
       |    CAST(SUM(CASE WHEN n >= 2 THEN CAST(ROUND(
       |      CAST(n_t AS DOUBLE) * CAST(a + c2 AS DOUBLE)
       |        / CAST(n AS DOUBLE) * 1000000000.0)
       |      AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS se,
       |    CAST(SUM(CASE WHEN n >= 2 THEN CAST(ROUND(
       |      CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE)
       |        * CAST(a + c2 AS DOUBLE) * CAST(b + d AS DOUBLE)
       |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       |          * CAST(n - 1 AS DOUBLE)) * 1000000000.0)
       |      AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS sv,
       |    CAST(SUM(CASE WHEN n >= 2 THEN CAST(ROUND(
       |      CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
       |        * 1000000000.0) AS DECIMAL(38,0)) END)
       |      AS DECIMAL(38,0)) AS sr,
       |    CAST(SUM(CASE WHEN n >= 2 THEN CAST(ROUND(
       |      CAST(b AS DOUBLE) * CAST(c2 AS DOUBLE) / CAST(n AS DOUBLE)
       |        * 1000000000.0) AS DECIMAL(38,0)) END)
       |      AS DECIMAL(38,0)) AS ss
       |  FROM (
       |    SELECT stratum, n_t, n_c, a, c2, n_t - a AS b, n_c - c2 AS d,
       |      n_t + n_c AS n
       |    FROM (
       |      SELECT stratum,
       |        CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
       |          AS BIGINT) AS n_t,
       |        CAST(SUM(CASE WHEN arm = 'treatment' THEN 0 ELSE 1 END)
       |          AS BIGINT) AS n_c,
       |        CAST(SUM(CASE WHEN arm = 'treatment' THEN converted
       |          ELSE 0 END) AS BIGINT) AS a,
       |        CAST(SUM(CASE WHEN arm = 'treatment' THEN 0
       |          ELSE converted END) AS BIGINT) AS c2
       |      FROM $rel GROUP BY stratum)))""".stripMargin

  /** Per-arm RATIO-metric readout with delta-method standard errors —
    * the estimator for "spend per basket"-style metrics where the unit
    * of analysis (household) differs from the ratio's denominator
    * (basket): R = Σy/Σx per arm, and the naive per-row variance is
    * wrong because x varies per unit. Delta method (first-order Taylor):
    *
    *   Var(R) ≈ (var_y + R²·var_x − 2R·cov_xy) / (n·mean_x²)
    *
    * with population moments over the arm's units.
    *
    * Scale shape: one map-side-combinable hash aggregate per arm
    * producing SIX totals (n, Σx, Σy, Σxy, Σx², Σy²); the closing
    * algebra runs on the arm table (rows = #arms). Sums accumulate as
    * DECIMAL (inputs quantized at 4 dp, products exact at scale 8) so
    * the totals are combine-order independent; the double closing uses
    * one fixed association, and `sqrt` is correctly rounded IEEE on
    * both engines — bit-identical without tolerance.
    */
  def ratioDelta(df: DataFrame): DataFrame = {
    val q = df.select(col("arm"),
      col("x").cast("decimal(18,4)").as("x"),
      col("y").cast("decimal(18,4)").as("y"))
    val m = q.groupBy("arm").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val muX = sx / n; val muY = sy / n
    val ratio = sy / sx
    val varY = col("syy").cast("double") / n - muY * muY
    val varX = col("sxx").cast("double") / n - muX * muX
    val covXY = col("sxy").cast("double") / n - muX * muY
    m.select(
      col("arm"), col("n"),
      round(sx, 4).as("sum_x"), round(sy, 4).as("sum_y"),
      round(ratio, 9).as("ratio"),
      round(sqrt(greatest(
        (varY + ratio * ratio * varX - lit(2.0) * ratio * covXY)
          / (muX * muX) / n, lit(0.0))), 9).as("se"))
  }
}
