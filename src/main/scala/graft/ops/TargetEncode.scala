package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leave-one-out target encoding — the standard high-cardinality
  * categorical encoder for tabular propensity models (the reference trains
  * on raw ratio features only; this is the op a user adds first when they
  * bring categorical columns to the same training set, `04b` spine).
  *
  * For each row, the encoding of its group is the target mean over the
  * OTHER rows of the group, smoothed toward the global mean `mu` with
  * pseudo-count `m`:
  *
  *   te = (sum_g - y + m*mu) / (n_g - 1 + m)
  *
  * Leaving the row's own target out is what prevents the target leaking
  * into its own feature (the plain group-mean encoder overfits exactly the
  * rare groups the smoothing is for); with `m = 0` and a singleton group
  * the denominator hits 0 → null → caller-visible, not silently the global
  * mean.
  *
  * Scale shape: one hash aggregate per group key (map-side combinable —
  * never a `PARTITION BY` window, which would buffer each group in one
  * task), one grand aggregate for `mu` broadcast as a 1-row cross join,
  * and one equi-join of the group stats back to the rows (shuffle on the
  * group key, or broadcast when the group dimension is small). The target
  * must be integral (0/1 labels, counts): sums are exact longs on both
  * engines, so the single closing division is bit-identical; the result is
  * rounded to 9 dp as a guard.
  */
object TargetEncode {

  /** Append column `te` encoding `targetCol` (integral) by `groupCols`.
    * `m` is the smoothing pseudo-count in rows.
    */
  def loo(df: DataFrame, groupCols: Seq[String], targetCol: String,
      m: Double): DataFrame = {
    require(groupCols.nonEmpty, "loo: at least one group column")
    require(m >= 0, s"loo: negative smoothing $m")
    val keys = groupCols.map(col)
    val stats = df.groupBy(keys: _*).agg(
      sum(col(targetCol)).cast("long").as("g_sum"),
      count(lit(1)).as("g_n"))
    val global = df.agg(
      (sum(col(targetCol)).cast("double") / count(lit(1)).cast("double"))
        .as("mu"))
    df.join(stats, groupCols)
      .crossJoin(broadcast(global))
      .withColumn("te", round(try_divide(
        col("g_sum").cast("double") - col(targetCol).cast("double")
          + lit(m) * col("mu"),
        col("g_n").cast("double") - lit(1.0) + lit(m)), 9))
      .drop("g_sum", "g_n", "mu")
  }
}
