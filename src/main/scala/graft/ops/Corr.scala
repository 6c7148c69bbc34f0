package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact two-pass grouped Pearson correlation / OLS slope — the
  * price-sensitivity and feature-redundancy primitive (`corr()` built-ins
  * accumulate raw double moments whose combine order is partition-
  * dependent; this operator is deterministic to the last bit).
  *
  * Two passes, both plain hash aggregates (map-side combinable):
  *
  *   pass 1: per-group Σx, Σy (DECIMAL) → 6-dp means
  *   pass 2: per-row deviations from the OWN GROUP's mean, quantized to
  *           DECIMAL(16,6); Σdx·dy, Σdx², Σdy² accumulate exactly
  *
  * Centering before accumulating is what makes the final doubles safe:
  * raw moments (Σxy) suffer catastrophic cancellation in `Σxy − ΣxΣy/n`
  * AND their decimal unscaled values outgrow 2^53 where engines convert
  * to double differently; centered sums have the magnitude of the
  * covariance itself, so every later conversion and division carries
  * only relative (1 ulp) error, absorbed by the closing 9-dp round. The
  * textbook one-pass trade-off, resolved for exactness at the cost of a
  * second scan.
  */
object Corr {

  /** Per-group `n, mean_x, mean_y, r, slope` (slope = OLS dy/dx).
    * Constant x or y in a group → r/slope null (no silent 0).
    */
  def pearsonByGroup(df: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "pearsonByGroup: at least one group column")
    val gs = groupCols.map(col)
    val q = df.select(gs :+ col(xCol).cast("decimal(18,6)").as("x")
      :+ col(yCol).cast("decimal(18,6)").as("y"): _*)
    val means = q.groupBy(gs: _*).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"))
      .select(gs ++ Seq(col("n"),
        round(col("sx").cast("double") / col("n").cast("double"), 6)
          .cast("decimal(12,6)").as("mx"),
        round(col("sy").cast("double") / col("n").cast("double"), 6)
          .cast("decimal(12,6)").as("my")): _*)
    val moments = q.join(means, groupCols)
      .select(gs ++ Seq(col("n"), col("mx"), col("my"),
        (col("x") - col("mx")).cast("decimal(16,6)").as("dx"),
        (col("y") - col("my")).cast("decimal(16,6)").as("dy")): _*)
      .groupBy(gs :+ col("n") :+ col("mx") :+ col("my"): _*)
      .agg(
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
    val den = sqrt(col("sxx").cast("double")) * sqrt(col("syy").cast("double"))
    moments.select(gs ++ Seq(
      col("n"),
      col("mx").cast("double").as("mean_x"),
      col("my").cast("double").as("mean_y"),
      round(when(den =!= 0.0, col("sxy").cast("double") / den), 9).as("r"),
      round(when(col("sxx").cast("double") =!= 0.0,
        col("sxy").cast("double") / col("sxx").cast("double")), 9)
        .as("slope")): _*)
  }
}
