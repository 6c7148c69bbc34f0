package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution (Anderl et al. 2016): the
  * data-driven multi-touch attribution model the reference's propensity
  * scores feed in production (SURVEY.md §1 — the reference stops at
  * daily batch scoring; which touchpoint CAUSED the purchase is the
  * question it leaves open). It replaces positional
  * heuristics (first/last-touch): model user journeys as a first-order
  * Markov chain over channels, and credit each channel by how much the
  * chain's conversion probability DROPS when that channel is removed.
  *
  * Decomposition (the 100 TB shape):
  *   1. `transitions` — the only data-sized pass: sessionize the event
  *      stream (30-min gap, same rule as the sessionizer family),
  *      truncate each session at its FIRST purchase (absorption), and
  *      count channel→channel transitions, with `__START__` entry,
  *      `__CONV__` for the converting step and `__NULL__` for sessions
  *      that end without converting. One shuffle + one sort per user,
  *      then a |channels|²-bounded hash aggregate.
  *   2. `removalEffects` — closing algebra on the collected transition
  *      matrix (≤ |channels|² rows — a control table, the ModelEval
  *      pattern): per scenario (base + one per removable channel),
  *      iterate the K-step conversion-absorption recurrence
  *        v₀ = 0;  v_{k+1}(s) = P(s,CONV) + Σ_t round₉(P(s,t)·v_k(t))
  *      in exact decimal arithmetic — probabilities quantized to
  *      DECIMAL(18,9) once, every product rounded HALF_UP to 9 dp,
  *      sums exact — so the iteration is bit-identical in any engine
  *      that follows the same quantization (the oracle unrolls the same
  *      K steps in DuckDB; hash equality proves it). The output is the
  *      DEFINED statistic "K-step absorption probability", not a
  *      float approximation of the fixed point.
  *
  * Removal semantics: scenario c keeps the BASE matrix's probabilities
  * but drops every transition into or out of c — lost mass means the
  * journey dies (no renormalization), so p_removed ≤ p_base and effects
  * are nonnegative by construction.
  */
object MarkovAttribution {

  val StartState = "__START__"
  val ConvState = "__CONV__"
  val NullState = "__NULL__"

  /** Sessionized, purchase-truncated channel transition counts:
    * (from_state, to_state, n). The single data-sized pass.
    */
  def transitions(ev: DataFrame,
      gapSeconds: Long = graft.streaming.EventOps.sessionGapSeconds,
      convType: String = "purchase"): DataFrame = {
    // THE sessionizer (EventOps.withSessionSeq) — the 30-minute gap rule
    // lives in one place for the whole sessionizer family
    val sess = graft.streaming.EventOps.withSessionSeq(ev, gapSeconds)
    val bySess = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts"), col("event_id"))
    // truncate at the first conversion: later events in the session are
    // post-absorption and must not contribute transitions
    val kept = sess
      .withColumn("prior_conv",
        count(when(col("event_type") === convType, lit(1)))
          .over(bySess.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("prior_conv") === 0)
    val seq = kept
      .withColumn("from_state",
        coalesce(lag(col("event_type"), 1).over(bySess), lit(StartState)))
      .withColumn("to_state",
        when(col("event_type") === convType, ConvState)
          .otherwise(col("event_type")))
      .withColumn("is_last", lead(col("event_id"), 1).over(bySess).isNull)
    seq.select(col("from_state"), col("to_state"))
      .unionAll(seq.filter(col("is_last") && col("to_state") =!= ConvState)
        .select(col("event_type").as("from_state"),
          lit(NullState).as("to_state")))
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
  }

  private def round9(x: JBigDecimal): JBigDecimal =
    x.setScale(9, RoundingMode.HALF_UP)

  private def round9d(x: Double): JBigDecimal = Round9.round9d(x)

  /** Per-channel removal effects from a (collected) transition-count
    * frame: (channel, p_base, p_removed, removal_effect,
    * attribution_share). `channels` must exclude the absorbing states.
    */
  def removalEffects(spark: SparkSession, trans: DataFrame,
      channels: Seq[String], steps: Int = 8,
      driverLimit: Long = 100000L): DataFrame = {
    require(steps >= 1, s"MarkovAttribution: steps ($steps) must be >= 1")
    // probed cutover guard (the Forecast/Survival pattern): the transition
    // frame is |states|²-bounded by construction (event-type cardinality),
    // but nothing upstream ENFORCES that — a caller feeding raw pairs
    // instead of counted transitions would collect the fact table. `limit`
    // computes only the partitions it needs, so an oversized frame is
    // detected without materializing it.
    val narrowed = trans
      .select(col("from_state"), col("to_state"), col("n")).cache()
    val probed = narrowed
      .limit(math.min(driverLimit + 1, Int.MaxValue.toLong).toInt).count()
    require(probed <= driverLimit,
      s"MarkovAttribution.removalEffects: transition frame exceeds " +
        s"$driverLimit rows — expected a |states|²-bounded count matrix " +
        "(run transitions() first, or aggregate to channel grain)")
    val counts = (try narrowed.collect() finally { narrowed.unpersist(); () })
      .map { r =>
        (r.getAs[String]("from_state"), r.getAs[String]("to_state")) ->
          r.getAs[Long]("n")
      }.toMap
    val totals = counts.groupBy(_._1._1).map { case (f, m) =>
      f -> m.values.sum
    }
    // base probabilities, quantized ONCE (all scenarios share them)
    val p: Map[(String, String), JBigDecimal] = counts.map {
      case ((f, t), n) =>
        (f, t) -> round9d(n.toDouble / totals(f).toDouble)
    }
    val transientAll = StartState +: channels
    def absorption(removed: Option[String]): JBigDecimal = {
      val transient = transientAll.filterNot(removed.contains)
      def pk(f: String, t: String): JBigDecimal =
        if (removed.exists(c => c == f || c == t)) JBigDecimal.ZERO
        else p.getOrElse((f, t), JBigDecimal.ZERO)
      var v = transient.map(_ -> JBigDecimal.ZERO).toMap
      for (_ <- 1 to steps) {
        v = transient.map { s =>
          val conv = pk(s, ConvState)
          val flow = transient.foldLeft(JBigDecimal.ZERO) { (acc, t) =>
            acc.add(round9(pk(s, t).multiply(v(t))))
          }
          s -> conv.add(flow)
        }.toMap
      }
      v(StartState)
    }
    val pBase = absorption(None)
    val rows = channels.map { c =>
      val pRem = absorption(Some(c))
      (c, pBase, pRem, pBase.subtract(pRem))
    }
    val totalEffect = rows.foldLeft(JBigDecimal.ZERO)((a, r) => a.add(r._4))
    val out = rows.map { case (c, pb, pr, eff) =>
      val share: Option[Double] =
        if (totalEffect.signum() == 0) None
        else Some(round9d(eff.doubleValue() / totalEffect.doubleValue())
          .doubleValue())
      (c, pb.doubleValue(), pr.doubleValue(), eff.doubleValue(), share)
    }
    import spark.implicits._
    out.toDF("channel", "p_base", "p_removed", "removal_effect",
      "attribution_share")
      .withColumn("attribution_share", col("attribution_share").cast("double"))
  }

  /** The full operator: transitions + removal effects. */
  def apply(ev: DataFrame, channels: Seq[String],
      steps: Int = 8): DataFrame =
    removalEffects(ev.sparkSession, transitions(ev), channels, steps)
}
