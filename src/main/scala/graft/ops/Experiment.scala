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
