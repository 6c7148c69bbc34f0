package graft.queriesdef

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryRegistry.Entry
import graft.streaming.EventOps

/** Event/time-series queries over `events` (batch forms of the streaming
  * operators — see graft.streaming.EventStreams for the readStream twins).
  */
object EventQueries {

  private val evCte =
    """ev AS (
      |  SELECT event_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts,
      |    user_id, event_type, value
      |  FROM events)""".stripMargin

  /** The SCD2 tier dimension (shared by `scd2_tiers` and
    * `scd2_pit_lookup`): per-user daily value tier collapsed into
    * validity intervals via Scd.type2.
    */
  private def tiersDim(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val daily = EventOps.events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double")
        .as("daily_value"))
      .withColumn("tier",
        when(col("daily_value") >= 150, "high")
          .when(col("daily_value") >= 60, "mid").otherwise("low"))
    graft.ops.Scd.type2(
      daily.select("user_id", "day", "tier"), Seq("user_id"), "day", "tier")
  }

  /** Oracle twin of [[tiersDim]]: CTE chain ending at `scd` with columns
    * (user_id, tier, valid_from, valid_to, n_obs). Expects `ev` upstream.
    */
  private val scdDimCtes: String =
    s"""daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day,
       |    ${Oracle.dsum("value", "daily_value")}
       |  FROM ev GROUP BY user_id, CAST(ts AS DATE)),
       |tiers AS (
       |  SELECT user_id, day,
       |    CASE WHEN daily_value >= 150 THEN 'high'
       |         WHEN daily_value >= 60 THEN 'mid'
       |         ELSE 'low' END AS tier
       |  FROM daily),
       |flagged AS (
       |  SELECT *,
       |    CASE WHEN ROW_NUMBER() OVER w = 1 THEN 1
       |         WHEN tier IS NOT DISTINCT FROM LAG(tier) OVER w THEN 0
       |         ELSE 1 END AS chg
       |  FROM tiers
       |  WINDOW w AS (PARTITION BY user_id ORDER BY day)),
       |islands AS (
       |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY day
       |    ROWS UNBOUNDED PRECEDING) AS island
       |  FROM flagged),
       |runs AS (
       |  SELECT user_id, island, min(tier) AS tier,
       |    min(day) AS valid_from, count(*) AS n_obs
       |  FROM islands GROUP BY user_id, island),
       |scd AS (
       |  SELECT user_id, tier, valid_from,
       |    LEAD(valid_from) OVER (PARTITION BY user_id
       |      ORDER BY valid_from) AS valid_to,
       |    n_obs
       |  FROM runs)""".stripMargin

  /** DuckDB oracle for `markov_removal_attribution`: the same
    * sessionize-truncate-count pass, then the SAME K-step decimal
    * absorption recurrence UNROLLED as chained CTEs (one `v{k}` block
    * per step — the BPE-oracle treatment of an iterative algorithm).
    * Every scenario (base + one per removed channel) iterates at once
    * via a scenario column on the probability/state frames.
    */
  private def markovOracle(channels: Seq[String], steps: Int): String = {
    val chanVals = channels.map(c => s"('$c')").mkString(", ")
    val stateVals = ("('__START__')" +: channels.map(c => s"('$c')"))
      .mkString(", ")
    val stepCtes = (1 to steps).map { k =>
      val prev = s"v${k - 1}"
      s"""v$k AS (
         |  SELECT st.scenario, st.state,
         |    CAST(COALESCE(MIN(cv.p), 0)
         |      + COALESCE(SUM(ROUND(pm.p * pv.v, 9)), 0)
         |      AS DECIMAL(18,9)) AS v
         |  FROM st
         |  LEFT JOIN pm cv ON cv.scenario = st.scenario
         |    AND cv.from_state = st.state AND cv.to_state = '__CONV__'
         |  LEFT JOIN pm ON pm.scenario = st.scenario
         |    AND pm.from_state = st.state
         |    AND pm.to_state NOT IN ('__CONV__', '__NULL__')
         |  LEFT JOIN $prev pv ON pv.scenario = pm.scenario
         |    AND pv.state = pm.to_state
         |  GROUP BY st.scenario, st.state)""".stripMargin
    }.mkString(",\n")
    s"""WITH $evCte,
       |g AS (
       |  SELECT *, CAST(epoch(ts) AS BIGINT) AS ep,
       |    LAG(CAST(epoch(ts) AS BIGINT)) OVER
       |      (PARTITION BY user_id ORDER BY ts, event_id) AS pep
       |  FROM ev),
       |ns AS (
       |  SELECT *, CASE WHEN pep IS NULL OR ep - pep > 1800
       |    THEN 1 ELSE 0 END AS new_session
       |  FROM g),
       |sess AS (
       |  SELECT *, SUM(new_session) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM ns),
       |kept AS (
       |  SELECT * FROM (
       |    SELECT *, COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
       |      OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS prior_conv
       |    FROM sess) t
       |  WHERE prior_conv = 0),
       |seq AS (
       |  SELECT *,
       |    COALESCE(LAG(event_type) OVER w, '__START__') AS from_state,
       |    CASE WHEN event_type = 'purchase' THEN '__CONV__'
       |      ELSE event_type END AS to_state,
       |    LEAD(event_id) OVER w IS NULL AS is_last
       |  FROM kept
       |  WINDOW w AS (PARTITION BY user_id, session_seq
       |    ORDER BY ts, event_id)),
       |trans AS (
       |  SELECT from_state, to_state FROM seq
       |  UNION ALL
       |  SELECT event_type, '__NULL__' FROM seq
       |  WHERE is_last AND to_state <> '__CONV__'),
       |tc AS (
       |  SELECT from_state, to_state, COUNT(*) AS c
       |  FROM trans GROUP BY 1, 2),
       |tot AS (
       |  SELECT from_state, CAST(SUM(c) AS BIGINT) AS tot
       |  FROM tc GROUP BY 1),
       |p AS (
       |  SELECT tc.from_state, tc.to_state,
       |    CAST(ROUND(CAST(tc.c AS DOUBLE) / CAST(tot.tot AS DOUBLE), 9)
       |      AS DECIMAL(18,9)) AS p
       |  FROM tc JOIN tot ON tc.from_state = tot.from_state),
       |scen AS (SELECT * FROM (VALUES ('base'), $chanVals) s(scenario)),
       |pm AS (
       |  SELECT s.scenario, p.from_state, p.to_state, p.p
       |  FROM p CROSS JOIN scen s
       |  WHERE s.scenario = 'base'
       |     OR (p.from_state <> s.scenario AND p.to_state <> s.scenario)),
       |st AS (
       |  SELECT s.scenario, x.state
       |  FROM (VALUES $stateVals) x(state)
       |  CROSS JOIN scen s
       |  WHERE s.scenario = 'base' OR x.state <> s.scenario),
       |v0 AS (SELECT scenario, state, CAST(0 AS DECIMAL(18,9)) AS v FROM st),
       |$stepCtes,
       |base AS (
       |  SELECT v AS p_base FROM v$steps
       |  WHERE scenario = 'base' AND state = '__START__'),
       |rem AS (
       |  SELECT scenario AS channel, v AS p_removed FROM v$steps
       |  WHERE scenario <> 'base' AND state = '__START__'),
       |eff AS (
       |  SELECT r.channel, b.p_base, r.p_removed,
       |    b.p_base - r.p_removed AS effect
       |  FROM rem r CROSS JOIN base b),
       |tote AS (SELECT CAST(SUM(effect) AS DECIMAL(18,9)) AS total FROM eff)
       |SELECT channel,
       |  CAST(p_base AS DOUBLE) AS p_base,
       |  CAST(p_removed AS DOUBLE) AS p_removed,
       |  CAST(effect AS DOUBLE) AS removal_effect,
       |  CASE WHEN t.total <> 0 THEN
       |    ROUND(CAST(effect AS DOUBLE) / CAST(t.total AS DOUBLE), 9)
       |  END AS attribution_share
       |FROM eff CROSS JOIN tote t""".stripMargin
  }

  def entries: Seq[Entry] = Seq(

    // Tumbling-window aggregate: window($"ts","1 hour") × event_type.
    Entry(
      "events_hourly",
      (s, dir) => EventOps.hourlyByType(EventOps.events(s, dir)),
      Some(s"""WITH $evCte
        |SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  ${Oracle.dsum("value", "sum_value")}
        |FROM ev GROUP BY date_trunc('hour', ts), event_type""".stripMargin)),

    // Sessionization (gaps-and-islands): lag + running sum over
    // (user_id ORDER BY ts, event_id), 30-minute gap.
    Entry(
      "sessionize",
      (s, dir) => EventOps.sessionize(EventOps.events(s, dir)),
      Some(s"""WITH $evCte,
        |g AS (
        |  SELECT *, CAST(epoch(ts) AS BIGINT) AS ep,
        |    LAG(CAST(epoch(ts) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS pep
        |  FROM ev),
        |n AS (
        |  SELECT *, CASE WHEN pep IS NULL OR ep - pep > 1800
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_session
        |  FROM g),
        |s AS (
        |  SELECT *, CAST(SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM n)
        |SELECT user_id, session_seq,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  ${Oracle.dsum("value", "session_value")}
        |FROM s GROUP BY user_id, session_seq""".stripMargin)),

    // Native session-window TVF: the same 30-minute-gap sessions via
    // Spark's session_window() — the idiomatic form (and the one that
    // runs unchanged under readStream with merging session state).
    // Merge semantics verified empirically (and caught by the sf0.1
    // full-corpus oracle audit, where one event pair lands EXACTLY 1800s
    // apart): sessions merge while the next start is AT OR BEFORE the
    // current window's end — touching windows merge — so the break is
    // diff > 1800, identical to the gaps-and-islands sessionizer; only
    // the reported session end differs (last_ts + gap). Execution is the
    // same one-shuffle-one-sort per user_id as the window form; session
    // state is bounded by the gap, not the history.
    Entry(
      "sessionize_native",
      (s, dir) => EventOps.events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("session_value"))
        .select(col("user_id"),
          col("w.start").as("session_start"),
          col("w.end").as("session_end"),
          col("n_events"), col("session_value")),
      Some(s"""WITH $evCte,
        |g AS (
        |  SELECT *, CAST(epoch(ts) AS BIGINT) AS ep,
        |    LAG(CAST(epoch(ts) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS pep
        |  FROM ev),
        |n AS (
        |  SELECT *, CASE WHEN pep IS NULL OR ep - pep > 1800
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM g),
        |s AS (
        |  SELECT *, SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM n)
        |SELECT user_id,
        |  min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events,
        |  ${Oracle.dsum("value", "session_value")}
        |FROM s GROUP BY user_id, session_seq""".stripMargin)),

    // Sliding-window aggregate: 1-hour windows every 15 minutes — each
    // event lands in 4 overlapping windows (window(ts, '1 hour', '15 min')).
    // Oracle enumerates the same 4 epoch-aligned starts per event.
    Entry(
      "events_sliding",
      (s, dir) => EventOps.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value")),
      Some(s"""WITH $evCte,
        |expd AS (
        |  SELECT t.*,
        |    ((t.ep - 900 * k.k) // 3600) * 3600 + 900 * k.k AS ws
        |  FROM (SELECT *, CAST(epoch(ts) AS BIGINT) AS ep FROM ev) t
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k)
        |SELECT make_timestamp(ws * 1000000) AS window_start, event_type,
        |  COUNT(*) AS n_events,
        |  ${Oracle.dsum("value", "sum_value")}
        |FROM expd GROUP BY ws, event_type""".stripMargin)),

    // Interval self-join: every purchase credited to each same-user view
    // in the preceding 30 minutes (view inclusive, window end exclusive).
    // Batch form of the stream-stream join twin
    // (EventStreams.attributionStream — same join, verbatim).
    Entry(
      "view_attribution",
      (s, dir) => EventOps.attribution(EventOps.events(s, dir)),
      Some(s"""WITH $evCte,
        |v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
        |      FROM ev WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
        |        value AS purchase_value
        |      FROM ev WHERE event_type = 'purchase')
        |SELECT v.user_id, v.view_id, p.purchase_id, v.view_ts, p.purchase_ts,
        |  CAST(epoch(p.purchase_ts) AS BIGINT) - CAST(epoch(v.view_ts) AS BIGINT)
        |    AS lag_seconds,
        |  p.purchase_value
        |FROM v JOIN p ON v.user_id = p.user_id
        | AND p.purchase_ts >= v.view_ts
        | AND CAST(epoch(p.purchase_ts) AS BIGINT)
        |     - CAST(epoch(v.view_ts) AS BIGINT) < 1800""".stripMargin)),

    // Time-decay multi-touch attribution: per purchase, every in-window
    // view weighted 1/(1+lag/600) (rational decay — engine-exact, unlike
    // libm exp), shares normalized through a DECIMAL(18,9) per-purchase
    // sum. See EventOps.attributionTimeDecay for the scale shape.
    Entry(
      "attribution_time_decay",
      (s, dir) => EventOps.attributionTimeDecay(EventOps.events(s, dir)),
      Some(s"""WITH $evCte,
        |v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
        |      FROM ev WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
        |        value AS purchase_value
        |      FROM ev WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT v.user_id, v.view_id, p.purchase_id, p.purchase_value,
        |    CAST(epoch(p.purchase_ts) AS BIGINT)
        |      - CAST(epoch(v.view_ts) AS BIGINT) AS lag_seconds
        |  FROM v JOIN p ON v.user_id = p.user_id
        |   AND p.purchase_ts >= v.view_ts
        |   AND CAST(epoch(p.purchase_ts) AS BIGINT)
        |       - CAST(epoch(v.view_ts) AS BIGINT) < 1800),
        |wt AS (
        |  SELECT *, CAST(ROUND(1.0 / (1.0 + CAST(lag_seconds AS DOUBLE)
        |      / 600.0), 9) AS DECIMAL(18,9)) AS weight
        |  FROM touch),
        |tot AS (
        |  SELECT purchase_id, SUM(weight) AS w_total,
        |    COUNT(*) AS n_touches
        |  FROM wt GROUP BY purchase_id)
        |SELECT w.user_id, w.purchase_id, w.view_id, w.lag_seconds,
        |  t.n_touches,
        |  CAST(w.weight AS DOUBLE) AS weight,
        |  ROUND(CAST(w.weight AS DOUBLE) / CAST(t.w_total AS DOUBLE), 9)
        |    AS share,
        |  ROUND(CAST(w.weight AS DOUBLE) / CAST(t.w_total AS DOUBLE)
        |    * w.purchase_value, 6) AS attributed_value
        |FROM wt w JOIN tot t ON w.purchase_id = t.purchase_id""".stripMargin)),

    // Latest-wins CDC compaction: change log keyed by (user_id, k),
    // error = delete, newest event decides; one partial-aggregable
    // max(struct) per key (EventOps.cdcLatestState scaladoc). The oracle
    // is the ROW_NUMBER definition — hash equality proves the argmax
    // decomposition.
    Entry(
      "cdc_latest_state",
      (s, dir) => EventOps.cdcLatestState(EventOps.events(s, dir)),
      Some("""WITH ch AS (
        |  SELECT user_id,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts, event_id,
        |    CASE WHEN event_type = 'error' THEN 'delete'
        |      ELSE 'upsert' END AS op,
        |    value
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, k
        |      ORDER BY ts DESC, event_id DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id, k) AS n_changes
        |  FROM ch)
        |SELECT user_id, k, value, ts AS updated_ts, n_changes
        |FROM r WHERE rn = 1 AND op = 'upsert'""".stripMargin)),

    // Per-user rolling features (lag / moving window / running total):
    // one shuffle + one sort serves all five windows; decimal window
    // sums make the floats engine-exact.
    Entry(
      "user_rolling",
      (s, dir) => EventOps.rollingFeatures(EventOps.events(s, dir)),
      Some(s"""WITH $evCte,
        |w AS (
        |  SELECT event_id, user_id, ts,
        |    CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value,
        |    ROW_NUMBER() OVER win AS event_index,
        |    LAG(CAST(value AS DECIMAL(18,4))) OVER win AS prev4,
        |    SUM(CAST(value AS DECIMAL(18,4))) OVER win3 AS sum4,
        |    COUNT(CAST(value AS DECIMAL(18,4))) OVER win3 AS n3,
        |    SUM(CAST(value AS DECIMAL(18,4))) OVER wcum AS cum4
        |  FROM ev
        |  WINDOW
        |    win AS (PARTITION BY user_id ORDER BY ts, event_id),
        |    win3 AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |    wcum AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, ts, value,
        |  CAST(event_index AS BIGINT) AS event_index,
        |  CAST(prev4 AS DOUBLE) AS prev_value,
        |  CAST(sum4 AS DOUBLE) AS sum_3,
        |  CAST(sum4 AS DOUBLE) / CAST(n3 AS DOUBLE) AS avg_3,
        |  CAST(cum4 AS DOUBLE) AS cum_value
        |FROM w""".stripMargin)),

    // Cohort retention matrix: first-seen day × day offset → distinct
    // users, via the distinct (user, day) pre-aggregate (no Expand).
    Entry(
      "user_cohorts",
      (s, dir) => EventOps.cohorts(EventOps.events(s, dir)),
      Some(s"""WITH $evCte,
        |d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM ev),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
        |SELECT f.cohort_day,
        |  CAST(datediff('day', f.cohort_day, d.day) AS BIGINT) AS day_offset,
        |  COUNT(*) AS n_users
        |FROM d JOIN f ON d.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin)),

    // Per-group feature normalization: z-score + min-max of value within
    // each event_type. Exact decimal moments (no float summation-order
    // dependence) + a fixed double-op sequence + 9-decimal rounding →
    // engine-bit-identical (ops.Normalize).
    Entry(
      "events_normalized",
      (s, dir) => graft.ops.Normalize.perGroup(
        EventOps.events(s, dir), Seq("event_type"), "value",
        keepCols = Seq("event_id")),
      Some(graft.ops.Normalize.perGroupSql(
        "events", "event_type", "value", Seq("event_id")))),

    // Quantile normalization: each event_type's value distribution
    // mapped onto the GLOBAL distribution — output values are the
    // input's own doubles RELOCATED by exact integer rank arithmetic
    // (half-up rational rounding via (2r(N−1)+(gn−1)) div (2(gn−1))),
    // zero float math, so the transform hash-matches bit for bit. The
    // global rank runs range-partitioned (no single-task window);
    // QuantileNormalize scaladoc.
    Entry(
      "quantile_normalize",
      (s, dir) => graft.ops.QuantileNormalize.perGroup(
        EventOps.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value")),
        Seq("event_type"), "value", "event_id"),
      Some(s"""WITH $evCte,
        |g AS (
        |  SELECT event_id, event_type, value,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) - 1 AS BIGINT) AS gr,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS gn
        |  FROM ev),
        |gi AS (
        |  SELECT value AS nv,
        |    CAST(ROW_NUMBER() OVER (ORDER BY value, event_id) - 1
        |      AS BIGINT) AS gidx
        |  FROM ev),
        |nn AS (SELECT COUNT(*) AS n FROM ev),
        |x AS (
        |  SELECT g.*, CASE WHEN g.gn = 1 THEN (nn.n - 1) // 2
        |    ELSE (2 * g.gr * (nn.n - 1) + (g.gn - 1))
        |      // (2 * (g.gn - 1)) END AS idx
        |  FROM g CROSS JOIN nn)
        |SELECT x.event_type, x.event_id, x.value,
        |  gi.nv AS normalized_value
        |FROM x JOIN gi ON x.idx = gi.gidx""".stripMargin)),

    // Ordered conversion funnel view → click → purchase: earliest
    // strictly-increasing chain per user (greedy = exact), k−1 user-keyed
    // joins, no window sort over history.
    Entry(
      "funnel_stages",
      (s, dir) => EventOps.funnel(EventOps.events(s, dir),
        Seq("view", "click", "purchase")),
      Some(s"""WITH $evCte,
        |s1 AS (SELECT user_id, MIN(ts) AS step1_ts FROM ev
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS step2_ts
        |       FROM ev e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.step1_ts
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS step3_ts
        |       FROM ev e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.step2_ts
        |       GROUP BY e.user_id)
        |SELECT s1.user_id, s1.step1_ts, s2.step2_ts, s3.step3_ts,
        |  CAST(1 + CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END
        |         + CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END
        |    AS BIGINT) AS reached_stage
        |FROM s1
        |LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin)),

    // Time-bounded funnel: each step must land within ONE HOUR of the
    // previous step (earliest-anchored, the product-analytics
    // convention — EventOps.funnelWindowed scaladoc).
    Entry(
      "funnel_windowed",
      (s, dir) => EventOps.funnelWindowed(EventOps.events(s, dir),
        Seq("view", "click", "purchase"), maxGapSeconds = 3600L),
      Some(s"""WITH $evCte,
        |s1 AS (SELECT user_id, MIN(ts) AS step1_ts FROM ev
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS step2_ts
        |       FROM ev e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.step1_ts
        |         AND CAST(epoch(e.ts) AS BIGINT)
        |           - CAST(epoch(s1.step1_ts) AS BIGINT) <= 3600
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS step3_ts
        |       FROM ev e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.step2_ts
        |         AND CAST(epoch(e.ts) AS BIGINT)
        |           - CAST(epoch(s2.step2_ts) AS BIGINT) <= 3600
        |       GROUP BY e.user_id)
        |SELECT s1.user_id, s1.step1_ts, s2.step2_ts, s3.step3_ts,
        |  CAST(1 + CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END
        |         + CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END
        |    AS BIGINT) AS reached_stage
        |FROM s1
        |LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin)),

    // Position-based (U-shaped) attribution: 0.4 first / 0.4 last /
    // 0.2 split across middle touches — the heuristic bookend to
    // time-decay and the Markov removal-effect model.
    Entry(
      "attribution_position",
      (s, dir) => EventOps.attributionPosition(EventOps.events(s, dir)),
      Some(s"""WITH $evCte,
        |v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
        |      FROM ev WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
        |        value AS purchase_value
        |      FROM ev WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT v.user_id, v.view_id, p.purchase_id, p.purchase_value,
        |    v.view_ts
        |  FROM v JOIN p ON v.user_id = p.user_id
        |   AND p.purchase_ts >= v.view_ts
        |   AND CAST(epoch(p.purchase_ts) AS BIGINT)
        |       - CAST(epoch(v.view_ts) AS BIGINT) < 1800),
        |r AS (
        |  SELECT *,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY purchase_id
        |      ORDER BY view_ts, view_id) AS BIGINT) AS pos,
        |    COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches
        |  FROM touch),
        |w AS (
        |  SELECT *, ROUND(
        |    CASE WHEN n_touches = 1 THEN 1.0
        |         WHEN n_touches = 2 THEN 0.5
        |         WHEN pos = 1 THEN 0.4
        |         WHEN pos = n_touches THEN 0.4
        |         ELSE 0.2 / CAST(n_touches - 2 AS DOUBLE) END, 9)
        |    AS weight
        |  FROM r)
        |SELECT user_id, purchase_id, view_id, pos, n_touches, weight,
        |  ROUND(weight * purchase_value, 6) AS attributed_value
        |FROM w""".stripMargin)),

    // Per-group winsorization: clip value to the [p05, p95] band of its
    // event_type (sort-based exact percentiles, 9-decimal-rounded cuts).
    Entry(
      "events_winsorized",
      (s, dir) => graft.ops.Winsorize.perGroup(
        EventOps.events(s, dir), Seq("event_type"), "value",
        keepCols = Seq("event_id")),
      Some(graft.ops.Winsorize.perGroupSql(
        "events", "event_type", "value", Seq("event_id")))),

    // Interval-containment incident stats (no equi-key): each error
    // event opens a 5-minute window; count the traffic inside every
    // window. NOT the pair join: the events×50 study measured the
    // bucketized range join at 229× cost for 50× data (pair work ∝
    // windows × points-per-window — quadratic in temporal density), so
    // the subtractive aggregates (count / conditional count / decimal
    // sum) come from ONE range-partitioned prefix pass with the window
    // boundaries injected as zero-weight probes, and only the
    // COUNT DISTINCT — genuinely set-valued — keeps a pair join, shrunk
    // to first-in-window coverage intervals whose pair count is the
    // OUTPUT size (IntervalStats scaladoc). Same results bit-for-bit;
    // the oracle stays DuckDB's native inequality join.
    Entry(
      "interval_join_errors",
      (s, dir) => {
        val ev = EventOps.events(s, dir)
          .withColumn("ep", unix_timestamp(col("ts")))
        val points = ev.select(col("event_id"), col("ep"), col("user_id"),
          lit(1L).as("n"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("np"),
          col("value").cast("decimal(18,4)").as("v4"))
        val wins = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("window_id"), col("ep").as("w_start"),
            (col("ep") + 300L).as("w_end"))
        val sums = graft.ops.IntervalStats.prefixDiff(points, "ep",
          "event_id", Seq("n", "np", "v4"), wins, "window_id",
          "w_start", "w_end")
        val users = graft.ops.IntervalStats.distinctInWindows(points, "ep",
          "user_id", wins, "window_id", "w_start", span = 300L)
        // users is LEFT-joined: distinctInWindows emits no row for a
        // window whose contained events all carry null keys (its scaladoc
        // tells callers to left-join + fill 0), while COUNT(*) in sums
        // still counts those events — an inner join here would drop the
        // window where the oracle emits it with n_users = 0.
        wins.select("window_id", "w_start")
          .join(sums, Seq("window_id"))
          .join(users, Seq("window_id"), "left")
          .select(col("window_id"), col("w_start"),
            col("n_in_window").as("n_events"),
            coalesce(col("n_distinct"), lit(0L)).as("n_users"),
            col("np_in_window").as("n_purchases"),
            col("v4_in_window").cast("double").as("sum_value"))
      },
      Some(s"""WITH $evCte,
        |e AS (SELECT event_id, CAST(epoch(ts) AS BIGINT) AS ep,
        |        event_type, value, user_id FROM ev),
        |w AS (SELECT event_id AS window_id, ep AS w_start, ep + 300 AS w_end
        |      FROM e WHERE event_type = 'error')
        |SELECT w.window_id, w.w_start,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT e.user_id) AS n_users,
        |  COUNT(CASE WHEN e.event_type = 'purchase' THEN 1 END) AS n_purchases,
        |  ${Oracle.dsum("e.value", "sum_value")}
        |FROM e JOIN w ON e.ep BETWEEN w.w_start AND w.w_end
        |GROUP BY w.window_id, w.w_start""".stripMargin)),

    // Time-based trailing window (RANGE frame): per-user count/sum over
    // the trailing HOUR of event time — row frames (user_rolling) cover
    // a fixed number of events; range frames cover a wall-clock span
    // regardless of event density (the rate-limiting / activity-burst
    // feature). Same one-shuffle-one-sort execution as the row-frame
    // windows; equal-timestamp peers are all in-frame in both engines,
    // so the result is order-independent. Decimal sums keep the floats
    // engine-exact.
    Entry(
      "user_trailing_1h",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ep"))
          .rangeBetween(-3599L, 0L)
        EventOps.events(s, dir)
          .withColumn("ep", unix_timestamp(col("ts")))
          .select(col("event_id"), col("user_id"), col("ts"), col("ep"),
            count(lit(1)).over(w).as("n_1h"),
            sum(col("value").cast("decimal(18,4)")).over(w)
              .cast("double").as("sum_1h"))
      },
      Some(s"""WITH $evCte,
        |e AS (SELECT *, CAST(epoch(ts) AS BIGINT) AS ep FROM ev)
        |SELECT event_id, user_id, ts, ep,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ep
        |  RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // Semi-structured payload extraction: events carry a JSON `props`
    // column (as real event logs do); pull `$.k` out per row
    // (get_json_object — per-row codegen'd path evaluation, no shuffle)
    // and aggregate per type. Missing keys surface as NULL in both
    // engines and are counted, not dropped.
    Entry(
      "events_json_props",
      (s, dir) => EventOps.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          count(when(col("k").isNull, lit(1))).as("n_missing")),
      Some("""SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS min_k,
        |  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS max_k,
        |  COUNT(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 END)
        |    AS n_missing
        |FROM events GROUP BY event_type""".stripMargin)),

    // Robust JSON ingestion with quarantine accounting: a deterministic
    // 10% of payloads are corrupted (md5-bucket rule, engine-identical),
    // parsed with from_json — Spark's PERMISSIVE path surfaces a
    // malformed payload as a null field, never a task failure — and the
    // per-type report counts quarantined rows beside the clean
    // aggregate. Hash equality proves the PERMISSIVE null-on-corrupt
    // semantics match the injected corruption exactly (the oracle nulls
    // precisely the injected rows).
    Entry(
      "events_json_quarantine",
      (s, dir) => EventOps.events(s, dir)
        .withColumn("raw",
          when(graft.ops.HashSplit.bucket(col("event_id"), 1000) < 100,
            concat(lit("{"), col("props"))).otherwise(col("props")))
        .withColumn("k", from_json(col("raw"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          count(when(col("k").isNull, lit(1))).as("n_quarantined"),
          sum(col("k")).as("sum_k")),
      Some(s"""WITH e AS (
        |  SELECT event_type,
        |    CASE WHEN ${graft.ops.HashSplit.bucketSql("event_id", 1000)} < 100
        |      THEN NULL
        |      ELSE CAST(json_extract(props, '$$.k') AS BIGINT) END AS k
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(CASE WHEN k IS NULL THEN 1 END) AS n_quarantined,
        |  CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM e GROUP BY event_type""".stripMargin)),

    // Per-user activity summary (events-table A2/A5 family).
    Entry(
      "user_activity",
      (s, dir) => EventOps.userActivity(EventOps.events(s, dir)),
      Some(s"""WITH $evCte,
        |gm AS (SELECT CAST(max(ts) AS DATE) AS max_day FROM ev)
        |SELECT user_id,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT event_type) AS n_types,
        |  ${Oracle.dsum("value", "total_value")},
        |  max(ts) AS last_seen,
        |  CAST(datediff('day', CAST(max(ts) AS DATE),
        |    (SELECT max_day FROM gm)) AS BIGINT) AS days_since_last
        |FROM ev GROUP BY user_id""".stripMargin)),

    // SCD Type 2 build: per-user daily value tier collapsed into validity
    // intervals (gaps-and-islands; see Scd scaladoc) — the dimension shape
    // the as-of lookup (pit_asof_lookup) resolves against. Tier comes from
    // a decimal-exact daily sum, so the threshold CASE is engine-stable.
    Entry(
      "scd2_tiers",
      (s, dir) => tiersDim(s, dir),
      Some(s"""WITH $evCte,
        |$scdDimCtes
        |SELECT user_id, tier, valid_from, valid_to, n_obs
        |FROM scd""".stripMargin)),

    // Point-in-time lookup against the SCD2 dimension: what tier was the
    // user in at each purchase instant (valid_from <= day < valid_to,
    // disjoint intervals → at most one match, no argmax; Scd.pitLookup
    // scaladoc). Completes the SCD story: scd2_tiers BUILDS the
    // dimension, this query CONSUMES it the way a warehouse join does.
    Entry(
      "scd2_pit_lookup",
      (s, dir) => {
        val spine = EventOps.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        graft.ops.Scd.pitLookup(spine, tiersDim(s, dir),
          Seq("user_id"), "day")
          .select("user_id", "day", "tier", "valid_from", "valid_to")
      },
      Some(s"""WITH $evCte,
        |$scdDimCtes,
        |spine AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM ev WHERE event_type = 'purchase')
        |SELECT s.user_id, s.day, d.tier, d.valid_from, d.valid_to
        |FROM spine s LEFT JOIN scd d
        |  ON s.user_id = d.user_id
        |  AND d.valid_from <= s.day
        |  AND (d.valid_to IS NULL OR s.day < d.valid_to)""".stripMargin)),

    // Load-completeness monitor: daily volume vs trailing 28-day mean,
    // with MISSING calendar days materialized as explicit zero rows —
    // the partial-load detector (EventOps.loadCompleteness scaladoc).
    Entry(
      "load_completeness",
      (s, dir) => EventOps.loadCompleteness(EventOps.events(s, dir)),
      Some(s"""WITH $evCte,
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
        |  FROM ev GROUP BY CAST(ts AS DATE)),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |cal AS (
        |  SELECT CAST(unnest(generate_series(b.lo, b.hi,
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |filled AS (
        |  SELECT c.day, CAST(COALESCE(d.n_events, 0) AS BIGINT)
        |    AS n_events
        |  FROM cal c LEFT JOIN daily d ON c.day = d.day),
        |t AS (
        |  SELECT *, COUNT(*) OVER w AS n_base,
        |    CAST(SUM(n_events) OVER w AS BIGINT) AS s_base
        |  FROM filled
        |  WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)),
        |t2 AS (
        |  SELECT day, n_events, n_base,
        |    CASE WHEN n_base > 0 THEN
        |      ROUND(CAST(s_base AS DOUBLE) / CAST(n_base AS DOUBLE), 9)
        |    END AS trailing_mean,
        |    CASE WHEN s_base > 0 THEN
        |      ROUND(CAST(n_events AS DOUBLE)
        |        / (CAST(s_base AS DOUBLE) / CAST(n_base AS DOUBLE)), 9)
        |    END AS ratio
        |  FROM t)
        |SELECT *, n_base >= 14 AND ratio IS NOT NULL AND ratio < 0.5
        |  AS alarm
        |FROM t2""".stripMargin)),

    // Snapshot reconciliation between two sliding activity windows —
    // SINGLE conditional aggregation, no full-outer join (see
    // SnapshotDiff scaladoc). Decimal-exact sums make the `changed`
    // comparison engine-deterministic.
    Entry(
      "snapshot_diff",
      (s, dir) => {
        val ev = EventOps.events(s, dir)
        val inA = col("ts") >= lit("2024-01-01").cast("timestamp") &&
          col("ts") < lit("2024-01-03").cast("timestamp")
        val inB = col("ts") >= lit("2024-01-02").cast("timestamp") &&
          col("ts") < lit("2024-01-04").cast("timestamp")
        graft.ops.SnapshotDiff.diff(ev, Seq("user_id"), col("value"), inA, inB)
      },
      Some(s"""WITH $evCte,
        |t AS (
        |  SELECT *,
        |    ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
        |      AS in_a,
        |    ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-04'
        |      AS in_b
        |  FROM ev)
        |SELECT user_id,
        |  COUNT(CASE WHEN in_a THEN 1 END) AS n_a,
        |  CAST(SUM(CASE WHEN in_a THEN CAST(value AS DECIMAL(18,4)) END)
        |    AS DOUBLE) AS amt_a,
        |  COUNT(CASE WHEN in_b THEN 1 END) AS n_b,
        |  CAST(SUM(CASE WHEN in_b THEN CAST(value AS DECIMAL(18,4)) END)
        |    AS DOUBLE) AS amt_b,
        |  CASE WHEN COUNT(CASE WHEN in_a THEN 1 END) = 0 THEN 'added'
        |       WHEN COUNT(CASE WHEN in_b THEN 1 END) = 0 THEN 'removed'
        |       WHEN COUNT(CASE WHEN in_a THEN 1 END)
        |              <> COUNT(CASE WHEN in_b THEN 1 END)
        |         OR CAST(SUM(CASE WHEN in_a THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE)
        |              <> CAST(SUM(CASE WHEN in_b THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE)
        |         THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM t WHERE in_a OR in_b
        |GROUP BY user_id""".stripMargin)),

    // Running-baseline anomaly ranking: each event z-scored against its
    // type's PRIOR history only (exact ×10⁴-quantized integer prefix
    // sums — streaming.AnomalyMonitor's batch twin; the stream form
    // carries the same three integers as state). Top-20 by |z| rather
    // than a fixed threshold, so the entry always exercises the full
    // machinery on uniform fixture data.
    Entry(
      "events_anomaly",
      (s, dir) => graft.streaming.AnomalyMonitor
        .detectBatch(EventOps.events(s, dir), k = 0.0, minBase = 100)
        .orderBy(abs(col("z")).desc, col("event_id"))
        .limit(20),
      Some(s"""WITH $evCte,
        |q AS (
        |  SELECT event_type, event_id, ts, value,
        |    CAST(ROUND(CAST(value AS DOUBLE) * 10000.0, 0) AS BIGINT) AS v4
        |  FROM ev),
        |c AS (
        |  SELECT *,
        |    COUNT(*) OVER tw AS base_n,
        |    COALESCE(CAST(SUM(v4) OVER tw AS BIGINT), 0) AS s1,
        |    COALESCE(CAST(SUM(v4 * v4) OVER tw AS BIGINT), 0) AS s2
        |  FROM q
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT event_type, event_id, ts, value,
        |    CAST(base_n AS BIGINT) AS base_n,
        |    ROUND(CAST(s1 AS DOUBLE) / CAST(base_n AS DOUBLE) / 10000.0, 9)
        |      AS base_mean,
        |    CASE WHEN SQRT(GREATEST(
        |        CAST(s2 AS DOUBLE) / CAST(base_n AS DOUBLE) / 100000000.0
        |          - (CAST(s1 AS DOUBLE) / CAST(base_n AS DOUBLE) / 10000.0)
        |          * (CAST(s1 AS DOUBLE) / CAST(base_n AS DOUBLE) / 10000.0),
        |        0.0)) <> 0.0
        |      THEN ROUND((CAST(v4 AS DOUBLE) / 10000.0
        |          - CAST(s1 AS DOUBLE) / CAST(base_n AS DOUBLE) / 10000.0)
        |        / SQRT(GREATEST(
        |          CAST(s2 AS DOUBLE) / CAST(base_n AS DOUBLE) / 100000000.0
        |            - (CAST(s1 AS DOUBLE) / CAST(base_n AS DOUBLE) / 10000.0)
        |            * (CAST(s1 AS DOUBLE) / CAST(base_n AS DOUBLE) / 10000.0),
        |          0.0)), 9)
        |      END AS z
        |  FROM c WHERE base_n >= 100)
        |SELECT * FROM z
        |WHERE z IS NOT NULL AND ABS(z) > 0.0
        |ORDER BY ABS(z) DESC, event_id LIMIT 20""".stripMargin)),

    // Markov removal-effect attribution (Anderl et al. 2016): sessions
    // as a first-order channel chain, each channel credited by how much
    // K-step conversion absorption drops with that channel removed.
    // Exact decimal-quantized iteration (probabilities rounded to 9 dp
    // once, each product re-rounded, sums exact) makes the recurrence
    // bit-identical across engines — the oracle UNROLLS the same 8
    // steps, so hash equality proves the whole model, not just the
    // transition counts. Data-sized work is one sessionize pass; the
    // chain algebra runs on the |channels|²-row control table
    // (MarkovAttribution scaladoc).
    Entry(
      "markov_removal_attribution",
      (s, dir) => graft.ops.MarkovAttribution(
        EventOps.events(s, dir),
        channels = Seq("view", "click", "signup", "error")),
      Some(markovOracle(Seq("view", "click", "signup", "error"), steps = 8)),
    ),

    // Clickstream path analysis: within-session event-type transitions
    // with next-step probabilities (__START__ = session entry); windows
    // bounded per (user, session) — EventOps.sessionPaths scaladoc.
    Entry(
      "session_paths",
      (s, dir) => EventOps.sessionPaths(EventOps.events(s, dir)),
      Some(s"""WITH $evCte,
        |g AS (
        |  SELECT *, CAST(epoch(ts) AS BIGINT) AS ep,
        |    LAG(CAST(epoch(ts) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ep
        |  FROM ev),
        |ns AS (
        |  SELECT *, CASE WHEN prev_ep IS NULL OR ep - prev_ep > 1800
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM g),
        |sess AS (
        |  SELECT *, CAST(SUM(new_session) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_seq
        |  FROM ns),
        |edges AS (
        |  SELECT COALESCE(LAG(event_type) OVER
        |      (PARTITION BY user_id, session_seq ORDER BY ts, event_id),
        |      '__START__') AS from_type,
        |    event_type AS to_type
        |  FROM sess),
        |agg AS (
        |  SELECT from_type, to_type, COUNT(*) AS n_transitions
        |  FROM edges GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n_transitions,
        |  ROUND(CAST(n_transitions AS DOUBLE) /
        |    CAST(CAST(SUM(n_transitions) OVER (PARTITION BY from_type)
        |      AS BIGINT) AS DOUBLE), 9) AS p_next
        |FROM agg""".stripMargin)))
}
