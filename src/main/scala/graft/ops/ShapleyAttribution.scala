package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact Shapley-value multi-touch attribution (Shapley 1953; the
  * coalition-game model marketing attribution standardized on — see e.g.
  * Zhao et al. 2018, "Shapley Value Methods for Attribution Modeling") —
  * the principled complement to [[MarkovAttribution]]'s removal effects
  * and the positional heuristics (`EventOps.attributionPosition`).
  *
  * Model: each converting user contributes their PRE-conversion channel
  * set T (events strictly before the first purchase). The coalition value
  * v(S) = number of conversions whose channel set ⊆ S, and channel c's
  * credit is the Shapley value
  *
  *   φ_c = Σ_{S ⊆ N∖{c}} |S|!·(n−1−|S|)!/n! · (v(S∪{c}) − v(S)).
  *
  * Efficiency: Σ_c φ_c = v(N) − v(∅) — conversions with at least one
  * touch are fully distributed (no-touch conversions carry no signal and
  * cancel in every marginal, so they are excluded up front).
  *
  * Exactness: with n channels the weights are rationals with common
  * denominator n!, so φ_c·n! = Σ |S|!(n−1−|S|)!·Δv(S) is an exact
  * integer; the ONLY floating step is the single closing division by n!.
  * Engine-exact UNROUNDED — no rounding convention needed at all.
  *
  * Scale shape: one data-sized pass (per-user channel-set bitmask — a
  * groupBy user with per-channel conditional max, map-side combinable);
  * everything after runs on the 2ⁿ-row mask table (n ≤ ~20 channels in
  * any real deployment; here 4). The subset-containment join is
  * 2ⁿ × 2ⁿ = 256 rows — a broadcast control table, never data-sized.
  */
object ShapleyAttribution {

  private def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)

  /** |S|-indexed integer weights |S|!·(n−1−|S|)! (denominator n!). */
  def weightsInt(n: Int): Seq[Long] =
    (0 until n).map(k => fact(k) * fact(n - 1 - k))

  /** Per-channel Shapley conversion credit. `ev` needs (user_id, ts,
    * event_type); `channels` are the touch types (bit i = channels(i)),
    * `convType` the absorbing conversion event.
    *
    * Output: (channel, shapley_conv, share) ordered by channel —
    * shapley_conv sums to v(N) − v(∅) across channels.
    */
  def apply(ev: DataFrame, channels: Seq[String],
      convType: String = "purchase"): DataFrame = {
    val n = channels.size
    require(n >= 1 && n <= 20,
      s"ShapleyAttribution: 1..20 channels, got $n")
    val spark = ev.sparkSession

    // first conversion per user (converted users only — inner join)
    val firstConv = ev.filter(col("event_type") === convType)
      .groupBy("user_id").agg(min(col("ts")).as("conv_ts"))
    // channel-set bitmask of strictly-pre-conversion touches:
    // mask = Σ_i 2^i · max(event_type = channels(i))
    val maskExpr = channels.zipWithIndex.map { case (c, i) =>
      max(when(col("event_type") === c, 1L).otherwise(0L)) * (1L << i)
    }.reduce(_ + _)
    val masks = ev.join(firstConv, Seq("user_id"))
      .filter(col("ts") < col("conv_ts"))
      .filter(col("event_type").isin(channels: _*))
      .groupBy("user_id").agg(maskExpr.as("mask"))
    val mTab = masks.groupBy("mask").agg(count(lit(1)).as("m"))

    // v(S) = Σ_{T ⊆ S} m(T) over all 2^n coalitions (control-sized)
    val coalitions = spark.range(1L << n)
      .select(col("id").cast("long").as("smask"))
    val v = coalitions.join(broadcast(mTab),
        col("smask").bitwiseAND(col("mask")) === col("mask"), "left")
      .groupBy("smask").agg(coalesce(sum(col("m")), lit(0L)).as("v"))

    // φ_c·n! = Σ_{S ∌ c} w(|S|)·(v(S|c) − v(S)) — exact integers
    import spark.implicits._
    val chTab = channels.zipWithIndex
      .map { case (c, i) => (c, 1L << i) }.toDF("channel", "cbit")
    val w = weightsInt(n).zipWithIndex
      .foldLeft(lit(null).cast("long")) { case (acc, (wk, k)) =>
        when(bit_count(col("smask")) === k, lit(wk)).otherwise(acc)
      }
    val base = v.select(col("smask"), col("v"), w.as("w"))
    val plus = v.select(col("smask").as("pmask"), col("v").as("v_plus"))
    val nums = chTab
      .join(base, col("smask").bitwiseAND(col("cbit")) === 0L)
      .join(plus, col("pmask") === col("smask") + col("cbit"))
      .groupBy("channel")
      .agg(sum(col("w") * (col("v_plus") - col("v"))).as("num"))
    val tot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    nums
      .withColumn("num_tot", sum(col("num")).over(tot))
      .select(
        col("channel"),
        // single divisions over exact integers — engine-exact unrounded
        (col("num").cast("double") / lit(fact(n).toDouble))
          .as("shapley_conv"),
        when(col("num_tot") =!= 0L,
          col("num").cast("double") / col("num_tot").cast("double"))
          .as("share"))
      .orderBy("channel")
  }
}
