package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delete-one-bucket jackknife for a mean — distribution-free standard
  * errors WITHOUT resampling randomness: units are assigned to `g`
  * buckets by content hash (rerun-stable, engine-exact — the same
  * arithmetic as `HashSplit`), the estimator is recomputed leaving each
  * bucket out, and the jackknife variance
  *
  *   var = (g-1)/g · Σ_i (θ_i − θ̄)²
  *
  * yields the CI. The block jackknife over hash buckets is the standard
  * cluster-robust variant (units, not rows, are the independence grain).
  *
  * Scale shape: ONE hash aggregate over the units (per-bucket decimal
  * sums — map-side combinable), then all θ_i algebra runs on the g-row
  * bucket table: leave-one-out totals are (S − s_i)/(N − n_i) — no
  * second data pass, no resampling, no shuffle beyond the g-key
  * aggregate. θ_i quantize to 9 dp decimals before the cross-bucket
  * sums, so the variance is combine-order independent and bit-identical
  * on any engine.
  */
object Jackknife {

  /** 95% CI for the mean of `valueCol` over units keyed by `unitCol`
    * (values pre-aggregated per unit by the caller). Output: one row
    * `(g, n_units, mean, se, ci_lo, ci_hi)`, all doubles rounded 9 dp.
    */
  def meanCi(perUnit: DataFrame, unitCol: String, valueCol: String,
      g: Int = 10): DataFrame = {
    require(g >= 2, s"meanCi: need at least 2 buckets, got $g")
    val buckets = perUnit
      .withColumn("b", HashSplit.bucket(col(unitCol), g))
      .groupBy("b")
      .agg(
        sum(col(valueCol).cast("decimal(18,4)")).cast("decimal(28,4)")
          .as("s_i"),
        count(lit(1)).as("n_i"))
    val totals = buckets.agg(
      sum(col("s_i")).cast("decimal(28,4)").as("s"),
      sum(col("n_i")).cast("long").as("n"),
      count(lit(1)).as("g_eff"))
    // Leave-one-out estimates CENTERED at the 9-dp overall mean and
    // quantized to 2 dp decimals. The centering matters for exactness,
    // not just conditioning: the jackknife sum-of-squares is shift-
    // invariant, and centered deviations keep every decimal that is
    // later cast to DOUBLE below 2^53 unscaled — above that, the
    // decimal→double conversion itself rounds differently per engine
    // (observed: int128-with-scale-18 sums diverged at ~1e-16 relative,
    // i.e. ~2e-7 in the raw θ² sum).
    val m9 = round(col("s").cast("double") / col("n").cast("double"), 9)
    val devs = buckets.crossJoin(broadcast(totals))
      .select(col("s"), col("n"), col("g_eff"),
        round(
          round((col("s") - col("s_i")).cast("double")
            / (col("n") - col("n_i")).cast("double"), 9) - m9, 2)
          .cast("decimal(12,2)").as("dev"))
    val stats = devs.groupBy("s", "n", "g_eff")
      .agg(
        sum(col("dev")).as("d_sum"),
        sum(col("dev") * col("dev")).as("d_sumsq"))
    stats.select(
      col("g_eff").as("g"), col("n").as("n_units"),
      round(col("s").cast("double") / col("n").cast("double"), 9).as("mean"),
      round(sqrt(greatest(
        (lit(1.0) - lit(1.0) / col("g_eff").cast("double")) *
          (col("d_sumsq").cast("double")
            - (col("d_sum").cast("double") * col("d_sum").cast("double"))
              / col("g_eff").cast("double")),
        lit(0.0))).as("se"), 9).as("se"))
      .withColumn("ci_lo",
        round(col("mean") - lit(1.96) * col("se"), 9))
      .withColumn("ci_hi",
        round(col("mean") + lit(1.96) * col("se"), 9))
  }
}
