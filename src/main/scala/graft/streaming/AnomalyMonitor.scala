package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key streaming anomaly detection against the key's OWN running
  * history: each event is z-scored against the mean/std of all PRIOR
  * events of its key, then folded into the state — the alerting shape of
  * a metrics pipeline (latency spikes, payment-amount fraud, sensor
  * drift), complementing the batch `spend_anomaly_zscore`'s calendar
  * windows.
  *
  * State per key is three exact integers — count, Σv, Σv² over values
  * quantized to 4 dp (stored ×10⁴ / ×10⁸) — so the running statistics
  * are EXACTLY the prefix sums regardless of how micro-batches slice the
  * stream: the streaming run and the batch cumulative-window twin are
  * value-identical (StreamingSpec pins it), not merely close. Bounded
  * state: 3 longs per key, no event retention. Σv² headroom: ~1e8 events
  * per key at |v| ≤ 10⁴ before a long overflows — raise the quantization
  * scale trade-off before that.
  *
  * Ordering contract: events are processed in (ts, event_id) order WITHIN
  * each invocation, and state carries across invocations in arrival
  * order — the monitor assumes per-key in-order arrival across
  * micro-batches (the usual contract for prefix-sum state; true
  * out-of-order handling needs watermarked buffering upstream).
  */
object AnomalyMonitor {

  case class Ev(event_id: Long, ts: java.sql.Timestamp, event_type: String,
      value: Double)
  case class Flag(event_type: String, event_id: Long,
      ts: java.sql.Timestamp, value: Double, base_n: Long, base_mean: Double,
      z: Double)
  case class RunState(n: Long, s1: Long, s2: Long)

  /** v quantized to 4 dp as integer ×10⁴ (exact state arithmetic).
    * HALF_UP on the BigDecimal of the double — the same rule as Spark's
    * `round()`, so the batch twin quantizes identically (math.round
    * differs on negative .5 halves: toward +∞ vs away from zero).
    */
  private def q4(v: Double): Long =
    BigDecimal(v * 1e4).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def zOf(st: RunState, v4: Long, k: Double, minBase: Long): Option[(Double, Double)] = {
    if (st.n < minBase) None
    else {
      val n = st.n.toDouble
      val mean = st.s1.toDouble / n / 1e4
      val varV = math.max(
        st.s2.toDouble / n / 1e8 - (st.s1.toDouble / n / 1e4) * (st.s1.toDouble / n / 1e4),
        0.0)
      val std = math.sqrt(varV)
      val v = v4.toDouble / 1e4
      if (std == 0.0) None
      else {
        val z = (v - mean) / std
        if (math.abs(z) > k) Some((mean, z)) else None
      }
    }
  }

  private def step(k: Double, minBase: Long)(
      key: String, rows: Iterator[Ev], state: GroupState[RunState]): Iterator[Flag] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var st = state.getOption.getOrElse(RunState(0L, 0L, 0L))
    val out = Seq.newBuilder[Flag]
    sorted.foreach { e =>
      val v4 = q4(e.value)
      zOf(st, v4, k, minBase).foreach { case (mean, z) =>
        out += Flag(key, e.event_id, e.ts, e.value, st.n,
          BigDecimal(mean).setScale(9, BigDecimal.RoundingMode.HALF_UP)
            .toDouble,
          BigDecimal(z).setScale(9, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }
      st = RunState(st.n + 1, st.s1 + v4, st.s2 + v4 * v4)
    }
    state.update(st)
    out.result().iterator
  }

  /** Streaming form: append-mode flags via flatMapGroupsWithState. */
  def detectStream(ev: DataFrame, k: Double = 3.0, minBase: Long = 10):
      Dataset[Flag] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.select(col("event_id").cast("long"), col("ts"), col("event_type"),
        col("value").cast("double")).as[Ev]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step(k, minBase))
  }

  /** Batch twin: the same flags from cumulative PRECEDING-frame prefix
    * sums over the (ts, event_id)-ordered history — exact integer
    * arithmetic, identical closing arithmetic to the stream.
    *
    * The per-type cumulative pass goes through
    * [[graft.ops.RangePrefix.groupedPrefixSums]] (exclusive = inclusive −
    * own row), NOT a bare `Window.partitionBy(event_type)`: with a
    * handful of event types the plain window caps parallelism at |types|
    * and one task drags each type's whole history (measured 18.7× growth
    * at events×50 before this change).
    */
  def detectBatch(ev: DataFrame, k: Double = 3.0, minBase: Long = 10):
      DataFrame = {
    val v4 = round(col("value").cast("double") * lit(1e4)).cast("long")
    val base = graft.ops.RangePrefix.groupedPrefixSums(
        ev.select(col("event_id").cast("long").as("event_id"),
          col("ts"), col("event_type"),
          col("value").cast("double").as("value"), v4.as("v4"))
          .withColumn("one", lit(1L))
          .withColumn("sq", col("v4") * col("v4")),
        Seq("event_type"), Seq(col("ts"), col("event_id")),
        Seq("one", "v4", "sq"))
      .withColumn("base_n", col("one_cum") - 1L)
      .withColumn("s1", col("v4_cum") - col("v4"))
      .withColumn("s2", col("sq_cum") - col("sq"))
      .filter(col("base_n") >= minBase)
    val n = col("base_n").cast("double")
    val mean = col("s1").cast("double") / n / lit(1e4)
    val varV = greatest(
      col("s2").cast("double") / n / lit(1e8)
        - (col("s1").cast("double") / n / lit(1e4))
        * (col("s1").cast("double") / n / lit(1e4)),
      lit(0.0))
    val std = sqrt(varV)
    base
      .withColumn("base_mean", round(mean, 9))
      .withColumn("z", when(std =!= 0.0,
        round((col("v4").cast("double") / lit(1e4) - mean) / std, 9)))
      .filter(col("z").isNotNull && abs(col("z")) > k)
      .select("event_type", "event_id", "ts", "value", "base_n",
        "base_mean", "z")
  }
}
