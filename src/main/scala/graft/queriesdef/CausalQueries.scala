package graft.queriesdef

import java.sql.Date
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryRegistry.Entry
import graft.core.Retail
import graft.ops.{Causal, Drift, Experiment, HashSplit, Screen, SeriesStats, ShapleyAttribution}
import graft.silver.TransactionsAdj
import graft.streaming.EventOps

/** Causal-inference and statistical-screening queries — the readout layer
  * downstream of the reference's propensity scores (the reference stops at
  * batch scoring, `04c`; these answer "what did the intervention DO" and
  * "which features deserve a model"): stratified IPW, matched ATT, uplift
  * Qini, exact two-sample KS drift, chi-square screening, and exact
  * Shapley multi-touch attribution.
  *
  * Shared unit table: one row per household with x = first-calendar-half
  * spend, y = second-half spend (the ab_cuped derivation). Strata are
  * fixed spend bands on x; the "observational treatment" is content-hash
  * assigned with a per-stratum rate (so treatment CORRELATES with x and
  * naive means are confounded — the estimators have something to correct).
  */
object CausalQueries {

  /** Fixed first-half-spend strata (money literals, engine-identical). */
  private val strataCuts = Seq(700000, 1000000, 1300000)

  /** Per-stratum treatment rate (buckets of 10): s1..s4. */
  private val treatRates = Seq(3, 4, 6, 7)

  private def stratumCol: org.apache.spark.sql.Column =
    when(col("x") < strataCuts(0), "s1")
      .when(col("x") < strataCuts(1), "s2")
      .when(col("x") < strataCuts(2), "s3")
      .otherwise("s4")

  private val stratumSql: String =
    s"""CASE WHEN x < ${strataCuts(0)} THEN 's1'
       | WHEN x < ${strataCuts(1)} THEN 's2'
       | WHEN x < ${strataCuts(2)} THEN 's3'
       | ELSE 's4' END""".stripMargin.replaceAll("\n", "")

  private def treatedCol: org.apache.spark.sql.Column = {
    val rate = when(col("stratum") === "s1", treatRates(0))
      .when(col("stratum") === "s2", treatRates(1))
      .when(col("stratum") === "s3", treatRates(2))
      .otherwise(treatRates(3))
    (HashSplit.bucket(col("household_key"), 10) < rate).cast("int")
  }

  private val treatedSql: String =
    s"""CASE WHEN ${HashSplit.bucketSql("household_key", 10)} <
       | CASE stratum WHEN 's1' THEN ${treatRates(0)}
       |  WHEN 's2' THEN ${treatRates(1)}
       |  WHEN 's3' THEN ${treatRates(2)}
       |  ELSE ${treatRates(3)} END
       | THEN 1 ELSE 0 END""".stripMargin.replaceAll("\n", "")

  /** Per-household (x, y) halves — the ab_cuped derivation. */
  private def perHousehold(s: SparkSession, dir: String): DataFrame = {
    val tx = TransactionsAdj(s, dir)
    val (lo, hi) = Retail.dayBounds(s, dir)
    val mid = lo.plusDays(ChronoUnit.DAYS.between(lo, hi) / 2)
    tx.groupBy("household_key").agg(
      sum(when(col("day") <= lit(Date.valueOf(mid)),
        col("amount_paid")).otherwise(lit(0.0)).cast("decimal(18,4)"))
        .cast("decimal(18,4)").as("x"),
      sum(when(col("day") > lit(Date.valueOf(mid)),
        col("amount_paid")).otherwise(lit(0.0)).cast("decimal(18,4)"))
        .cast("decimal(18,4)").as("y"))
  }

  /** Oracle CTEs ending at `asg` = (household_key, x, y, stratum,
    * treated) — the shared observational unit table.
    */
  private val unitsCtes: String =
    s"""${Oracle.txAdjFull},
       |gb2 AS (
       |  SELECT min(day) AS lo,
       |    min(day) + CAST((max(day) - min(day)) // 2 AS INT) AS mid
       |  FROM tx),
       |ph AS (
       |  SELECT household_key,
       |    CAST(SUM(CAST(CASE WHEN t.day <= g.mid THEN amount_paid
       |      ELSE 0.0 END AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS x,
       |    CAST(SUM(CAST(CASE WHEN t.day > g.mid THEN amount_paid
       |      ELSE 0.0 END AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS y
       |  FROM tx t CROSS JOIN gb2 g
       |  GROUP BY household_key),
       |strat AS (SELECT *, $stratumSql AS stratum FROM ph),
       |asg AS (SELECT *, $treatedSql AS treated FROM strat)""".stripMargin

  private val evCte =
    """ev AS (
      |  SELECT event_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts,
      |    user_id, event_type, value
      |  FROM events)""".stripMargin

  /** Brand screen fixtures shared by chi2_screen / mi_screen: five
    * first-half brand-purchase indicators vs a second-half target-brand
    * label, long form (feature, f, label).
    */
  private val screenBrands =
    Seq("Brand#5", "Brand#11", "Brand#17", "Brand#21", "Brand#24")

  private def brandScreenRows(s: SparkSession, dir: String): DataFrame = {
    val txc = graft.features.FeatureBuilder.txWithCommodity(s, dir)
    val (lo, hi) = Retail.dayBounds(s, dir)
    val mid = Date.valueOf(
      lo.plusDays(ChronoUnit.DAYS.between(lo, hi) / 2))
    val hh = txc.groupBy("household_key").agg(
      max(when(col("day") > lit(mid)
        && col("commodity_desc") === "Brand#12", 1L).otherwise(0L))
        .as("label"),
      screenBrands.map(b =>
        max(when(col("day") <= lit(mid)
          && col("commodity_desc") === b, 1L).otherwise(0L))
          .as(s"f$b")): _*)
    hh.select(col("label"), expr(
      "stack(5, " + screenBrands.map(b => s"'$b', `f$b`").mkString(", ")
        + ") AS (feature, f)"))
  }

  /** Oracle CTE chain ending at `ct` = (feature, a, b, c, d) — the 2x2
    * contingency counts of [[brandScreenRows]].
    */
  private val screenCtCtes: String = {
    val flags = screenBrands.map(b =>
      s"""MAX(CASE WHEN t.day <= g.mid AND commodity_desc = '$b'
         | THEN 1 ELSE 0 END) AS "f$b"""".stripMargin
        .replaceAll("\n", "")).mkString(",\n        |    ")
    val unioned = screenBrands.map(b =>
      s"""SELECT '$b' AS feature, "f$b" AS f, label FROM hh""")
      .mkString("\n        |  UNION ALL ")
    s"""${Oracle.txCommodity},
        |gb2 AS (
        |  SELECT min(day) AS lo,
        |    min(day) + CAST((max(day) - min(day)) // 2 AS INT) AS mid
        |  FROM tx),
        |hh AS (
        |  SELECT household_key,
        |    MAX(CASE WHEN t.day > g.mid AND commodity_desc = 'Brand#12'
        |      THEN 1 ELSE 0 END) AS label,
        |    $flags
        |  FROM txc t CROSS JOIN gb2 g GROUP BY household_key),
        |lf AS (
        |  $unioned),
        |ct AS (
        |  SELECT feature,
        |    CAST(SUM(f * label) AS BIGINT) AS a,
        |    CAST(SUM(f * (1 - label)) AS BIGINT) AS b,
        |    CAST(SUM((1 - f) * label) AS BIGINT) AS c,
        |    CAST(SUM((1 - f) * (1 - label)) AS BIGINT) AS d
        |  FROM lf GROUP BY feature)""".stripMargin
  }

  /** Weekly total-spend series (t = weeks since the first day) — the
    * calendar-bounded control-sized series the SeriesStats diagnostics
    * run on (hundreds of rows at any data scale).
    */
  private def weeklySpend(s: SparkSession, dir: String): DataFrame = {
    val tx = TransactionsAdj(s, dir)
    val (lo, _) = Retail.dayBounds(s, dir)
    tx.groupBy(expr(s"datediff(day, DATE '$lo') div 7").as("t"))
      .agg(sum(col("amount_paid").cast("decimal(18,4)"))
        .cast("decimal(18,4)").as("x"))
  }

  /** Oracle CTEs ending at `si` = (t, ix HUGEINT 1e-4 units). */
  private val weeklyCtes: String =
    s"""${Oracle.txAdjFull},
       |gb2 AS (SELECT min(day) AS lo FROM tx),
       |wk AS (
       |  SELECT CAST((t.day - g.lo) // 7 AS BIGINT) AS t,
       |    CAST(SUM(CAST(amount_paid AS DECIMAL(18,4)))
       |      AS DECIMAL(18,4)) AS x
       |  FROM tx t CROSS JOIN gb2 g
       |  GROUP BY CAST((t.day - g.lo) // 7 AS BIGINT)),
       |si AS (SELECT t, CAST(x * 10000 AS HUGEINT) AS ix FROM wk)"""
      .stripMargin

  def entries: Seq[Entry] = Seq(

    // Stratified inverse-propensity ATE: treatment is hash-assigned at a
    // rate that RISES with the spend stratum, so the naive pooled
    // difference of means is confounded upward; the stratified estimator
    // recovers the (here ~0) true effect. One hash aggregate; __all__
    // closes over 9dp-quantized per-stratum terms (Causal scaladoc).
    Entry(
      "ipw_ate",
      (s, dir) => {
        val units = perHousehold(s, dir)
          .withColumn("stratum", stratumCol)
          .withColumn("treated", treatedCol)
        Causal.ipwStratified(units).orderBy("stratum")
      },
      Some(s"""WITH $unitsCtes,
        |st AS (
        |  SELECT stratum, COUNT(*) AS n,
        |    CAST(SUM(treated) AS BIGINT) AS n_treat,
        |    SUM(CASE WHEN treated = 1 THEN y
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS sy_t,
        |    SUM(CASE WHEN treated = 0 THEN y
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS sy_c
        |  FROM asg GROUP BY stratum),
        |per AS (
        |  SELECT stratum, n, n_treat,
        |    CAST(n_treat AS DOUBLE) / CAST(n AS DOUBLE) AS e_hat,
        |    CAST(sy_t AS DOUBLE) / NULLIF(CAST(n_treat AS DOUBLE), 0)
        |      AS mean_treat,
        |    CAST(sy_c AS DOUBLE) / NULLIF(CAST(n - n_treat AS DOUBLE), 0)
        |      AS mean_ctrl,
        |    CAST(sy_t AS DOUBLE) / NULLIF(CAST(n_treat AS DOUBLE), 0)
        |      - CAST(sy_c AS DOUBLE)
        |        / NULLIF(CAST(n - n_treat AS DOUBLE), 0) AS effect,
        |    CASE WHEN n_treat > 0 AND n - n_treat > 0 THEN
        |      CAST(sy_t AS DOUBLE) / CAST(n_treat AS DOUBLE)
        |        - CAST(sy_c AS DOUBLE) / CAST(n - n_treat AS DOUBLE)
        |    END AS dim_raw
        |  FROM st),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all,
        |    CAST(SUM(n_treat) AS BIGINT) AS nt_all FROM per),
        |allr AS (
        |  SELECT '__all__' AS stratum, t.n_all AS n, t.nt_all AS n_treat,
        |    CAST(t.nt_all AS DOUBLE) / CAST(t.n_all AS DOUBLE) AS e_hat,
        |    CAST(NULL AS DOUBLE) AS mean_treat,
        |    CAST(NULL AS DOUBLE) AS mean_ctrl,
        |    CAST(SUM(CAST((CAST(p.n AS DOUBLE)
        |        / CAST(t.n_all AS DOUBLE)) * p.dim_raw
        |      AS DECIMAL(18,9))) AS DOUBLE) AS effect
        |  FROM per p CROSS JOIN tot t
        |  GROUP BY t.n_all, t.nt_all)
        |SELECT stratum, n, n_treat, e_hat, mean_treat, mean_ctrl, effect
        |FROM (SELECT stratum, n, n_treat, e_hat, mean_treat, mean_ctrl,
        |        effect FROM per
        |      UNION ALL SELECT * FROM allr)
        |ORDER BY stratum""".stripMargin)),

    // Nearest-neighbor matched ATT: exact on stratum, nearest on x (the
    // confounder), with replacement — found by a sorted prev/next window
    // scan, never a pairwise join (Causal.matchedAtt scaladoc).
    Entry(
      "psm_match",
      (s, dir) => {
        val units = perHousehold(s, dir)
          .withColumn("stratum", stratumCol)
          .withColumn("treated", treatedCol)
          .withColumn("id", col("household_key"))
        Causal.matchedAtt(units).orderBy("stratum")
      },
      Some(s"""WITH $unitsCtes,
        |m AS (
        |  SELECT *,
        |    last_value(CASE WHEN treated = 0 THEN x END IGNORE NULLS)
        |      OVER wb AS prev_x,
        |    last_value(CASE WHEN treated = 0 THEN y END IGNORE NULLS)
        |      OVER wb AS prev_y,
        |    first_value(CASE WHEN treated = 0 THEN x END IGNORE NULLS)
        |      OVER wf AS next_x,
        |    first_value(CASE WHEN treated = 0 THEN y END IGNORE NULLS)
        |      OVER wf AS next_y
        |  FROM asg
        |  WINDOW wb AS (PARTITION BY stratum
        |    ORDER BY x, treated, household_key
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY stratum
        |    ORDER BY x, treated, household_key
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |tr AS (
        |  SELECT stratum, y,
        |    CASE WHEN prev_x IS NULL THEN next_y
        |         WHEN next_x IS NULL THEN prev_y
        |         WHEN x - prev_x <= next_x - x THEN prev_y
        |         ELSE next_y END AS y_match
        |  FROM m WHERE treated = 1),
        |per AS (
        |  SELECT stratum, COUNT(*) AS n_treated,
        |    COUNT(y_match) AS n_matched,
        |    SUM(y - y_match) AS sdiff
        |  FROM tr GROUP BY stratum)
        |SELECT stratum, n_treated, n_matched,
        |  CAST(sdiff AS DOUBLE) / NULLIF(CAST(n_matched AS DOUBLE), 0) AS att
        |FROM per
        |UNION ALL
        |SELECT '__all__', CAST(SUM(n_treated) AS BIGINT),
        |  CAST(SUM(n_matched) AS BIGINT),
        |  CAST(SUM(sdiff) AS DOUBLE)
        |    / NULLIF(CAST(SUM(n_matched) AS DOUBLE), 0)
        |FROM per
        |ORDER BY stratum""".stripMargin)),

    // Uplift deciles + Qini curve for a RANDOMIZED treatment targeted by
    // score x: per-decile incremental conversion and the cumulative Qini
    // value, every number an exact-integer ratio (Causal.upliftQini).
    // Deciles via Ntile.global — no single-task ntile window.
    Entry(
      "uplift_qini",
      (s, dir) => {
        val units = perHousehold(s, dir).select(
          col("household_key").as("id"),
          when(HashSplit.bucket(col("household_key"), 2) === 0, 0)
            .otherwise(1).as("treated"),
          col("x").as("score"),
          when(col("y") > 1000000, 1).otherwise(0).as("converted"))
        Causal.upliftQini(units)
      },
      Some(s"""WITH $unitsCtes,
        |u AS (
        |  SELECT household_key, x AS score,
        |    CASE WHEN ${HashSplit.bucketSql("household_key", 2)} = 0
        |      THEN 0 ELSE 1 END AS t,
        |    CASE WHEN y > 1000000 THEN 1 ELSE 0 END AS c
        |  FROM ph),
        |tiled AS (
        |  SELECT *, CAST(ntile(10) OVER (ORDER BY score DESC,
        |    household_key) AS BIGINT) AS decile
        |  FROM u),
        |per AS (
        |  SELECT decile, COUNT(*) AS n,
        |    CAST(SUM(t) AS BIGINT) AS n_treat,
        |    CAST(SUM(t * c) AS BIGINT) AS conv_treat,
        |    CAST(SUM((1 - t) * c) AS BIGINT) AS conv_ctrl
        |  FROM tiled GROUP BY decile),
        |cum AS (
        |  SELECT *,
        |    CAST(SUM(n_treat) OVER w AS BIGINT) AS cum_nt,
        |    CAST(SUM(n - n_treat) OVER w AS BIGINT) AS cum_nc,
        |    CAST(SUM(conv_treat) OVER w AS BIGINT) AS cum_ct,
        |    CAST(SUM(conv_ctrl) OVER w AS BIGINT) AS cum_cc
        |  FROM per
        |  WINDOW w AS (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT decile, n, n_treat, conv_treat, conv_ctrl,
        |  CAST(conv_treat AS DOUBLE) / NULLIF(CAST(n_treat AS DOUBLE), 0)
        |    - CAST(conv_ctrl AS DOUBLE)
        |      / NULLIF(CAST(n - n_treat AS DOUBLE), 0)
        |    AS uplift,
        |  CAST(CAST(cum_ct AS HUGEINT) * CAST(cum_nc AS HUGEINT)
        |      - CAST(cum_cc AS HUGEINT) * CAST(cum_nt AS HUGEINT)
        |      AS DOUBLE) / NULLIF(CAST(cum_nc AS DOUBLE), 0) AS qini
        |FROM cum ORDER BY decile""".stripMargin)),

    // EXACT two-sample KS between first-half and second-half basket
    // totals — unbinned sup|F_a − F_b| with the maximizing value, every
    // gap an exact int128 cross-product (Drift.exactKs scaladoc; the
    // cumulative counts use the Ntile range-partition trick, so no
    // single-task window over the value domain).
    Entry(
      "spend_drift_ks",
      (s, dir) => {
        val tx = TransactionsAdj(s, dir)
        val (lo, hi) = Retail.dayBounds(s, dir)
        val mid = lo.plusDays(ChronoUnit.DAYS.between(lo, hi) / 2)
        val baskets = tx.groupBy("basket_id").agg(
          min(col("day")).as("day0"),
          sum(col("amount_paid").cast("decimal(18,4)"))
            .cast("decimal(18,4)").as("value"))
        Drift.exactKs(baskets, "value",
          col("day0") <= lit(Date.valueOf(mid)))
      },
      Some(s"""WITH ${Oracle.txAdjFull},
        |gb2 AS (
        |  SELECT min(day) AS lo,
        |    min(day) + CAST((max(day) - min(day)) // 2 AS INT) AS mid
        |  FROM tx),
        |bk AS (
        |  SELECT basket_id, MIN(day) AS day0,
        |    CAST(SUM(CAST(amount_paid AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) AS v
        |  FROM tx GROUP BY basket_id),
        |g AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN day0 <= g2.mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN day0 <= g2.mid THEN 0 ELSE 1 END)
        |      AS BIGINT) AS b
        |  FROM bk CROSS JOIN gb2 g2 GROUP BY v),
        |c AS (
        |  SELECT v,
        |    CAST(SUM(a) OVER w AS BIGINT) AS ca,
        |    CAST(SUM(b) OVER w AS BIGINT) AS cb,
        |    CAST(SUM(a) OVER () AS BIGINT) AS na,
        |    CAST(SUM(b) OVER () AS BIGINT) AS nb
        |  FROM g
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |gaps AS (
        |  SELECT v, na, nb,
        |    abs(CAST(ca AS HUGEINT) * CAST(nb AS HUGEINT)
        |      - CAST(cb AS HUGEINT) * CAST(na AS HUGEINT)) AS gap
        |  FROM c),
        |mg AS (SELECT MAX(gap) AS mg FROM gaps)
        |SELECT MAX(na) AS n_a, MAX(nb) AS n_b,
        |  CAST(MAX(gap) AS DOUBLE)
        |    / NULLIF(CAST(CAST(MAX(na) AS HUGEINT)
        |      * CAST(MAX(nb) AS HUGEINT) AS DOUBLE), 0) AS ks,
        |  CAST(MIN(v) AS DOUBLE) AS ks_at
        |FROM gaps, mg WHERE gap = mg.mg""".stripMargin)),

    // Chi-square / Cramér's V screen: five first-half brand-purchase
    // indicators against a second-half target-brand label, each statistic
    // ONE double division over exact int128 products (Screen scaladoc).
    Entry(
      "chi2_screen",
      (s, dir) => Screen.chi2(brandScreenRows(s, dir)),
      Some(s"""WITH $screenCtCtes
        |${Screen.chi2Sql("ct")}""".stripMargin)),

    // Mutual-information screen over the same brand indicators: MI in
    // nats, marginal entropies, and normalized MI — ln terms quantized
    // to 9dp decimals before the exact sum (Screen.mutualInfo scaladoc).
    Entry(
      "mi_screen",
      (s, dir) => Screen.mutualInfo(brandScreenRows(s, dir)),
      Some(s"""WITH $screenCtCtes
        |${Screen.mutualInfoSql("ct")}""".stripMargin)),

    // Exact Shapley multi-touch attribution over the four touch channels:
    // coalition values from pre-conversion channel-set bitmasks, credits
    // as exact integers over denominator n! (ShapleyAttribution scaladoc;
    // complements markov_removal_attribution / attribution_position).
    Entry(
      "attribution_shapley",
      (s, dir) => ShapleyAttribution(
        EventOps.events(s, dir),
        Seq("click", "error", "signup", "view")),
      Some(s"""WITH $evCte,
        |fc AS (
        |  SELECT user_id, MIN(ts) AS conv_ts
        |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id),
        |mk AS (
        |  SELECT e.user_id,
        |    CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) * 1
        |    + CAST(MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) * 2
        |    + CAST(MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS BIGINT) * 4
        |    + CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) * 8 AS mask
        |  FROM ev e JOIN fc ON e.user_id = fc.user_id
        |  WHERE e.ts < fc.conv_ts
        |    AND e.event_type IN ('click', 'error', 'signup', 'view')
        |  GROUP BY e.user_id),
        |mt AS (SELECT mask, COUNT(*) AS m FROM mk GROUP BY mask),
        |co AS (SELECT CAST(range AS BIGINT) AS smask FROM range(16)),
        |v AS (
        |  SELECT smask, CAST(COALESCE(SUM(m), 0) AS BIGINT) AS v
        |  FROM co LEFT JOIN mt ON (smask & mask) = mask
        |  GROUP BY smask),
        |vw AS (
        |  SELECT smask, v,
        |    CASE ((smask >> 0) & 1) + ((smask >> 1) & 1)
        |      + ((smask >> 2) & 1) + ((smask >> 3) & 1)
        |      WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END AS w
        |  FROM v),
        |ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
        |  ('signup', 4), ('view', 8)) AS t(channel, cbit)),
        |nums AS (
        |  SELECT channel,
        |    CAST(SUM(vb.w * (vp.v - vb.v)) AS BIGINT) AS num
        |  FROM ch
        |  JOIN vw vb ON (vb.smask & cbit) = 0
        |  JOIN v vp ON vp.smask = vb.smask + cbit
        |  GROUP BY channel),
        |tt AS (SELECT CAST(SUM(num) AS BIGINT) AS num_tot FROM nums)
        |SELECT channel,
        |  CAST(num AS DOUBLE) / 24.0 AS shapley_conv,
        |  CAST(num AS DOUBLE) / NULLIF(CAST(num_tot AS DOUBLE), 0) AS share
        |FROM nums, tt ORDER BY channel""".stripMargin)),

    // Two-proportion conversion test on the randomized arms: pooled z,
    // per-arm Wilson intervals, and the design's minimum detectable
    // effect — one aggregate to four integers, every statistic closed
    // with pinned-association IEEE arithmetic, unrounded
    // (Experiment.proportionTest scaladoc).
    Entry(
      "ab_proportion",
      (s, dir) => {
        val units = perHousehold(s, dir).select(
          when(HashSplit.bucket(col("household_key"), 2) === 0,
            lit("control")).otherwise(lit("treatment")).as("arm"),
          when(col("y") > 1000000, 1).otherwise(0).as("converted"))
        Experiment.proportionTest(units)
      },
      Some(s"""WITH $unitsCtes,
        |u AS (
        |  SELECT CASE WHEN ${HashSplit.bucketSql("household_key", 2)} = 0
        |      THEN 'control' ELSE 'treatment' END AS arm,
        |    CASE WHEN y > 1000000 THEN 1 ELSE 0 END AS converted
        |  FROM ph),
        |agg AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_c,
        |    CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_t,
        |    CAST(SUM(CASE WHEN arm = 'control' THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_c,
        |    CAST(SUM(CASE WHEN arm = 'treatment' THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_t
        |  FROM u)
        |${Experiment.proportionTestSql("agg")}""".stripMargin)),

    // Cochran–Mantel–Haenszel stratified conversion test + pooled MH odds
    // ratio on the same randomized arms, stratified by pre-period spend
    // quartile — the Simpson's-paradox-safe companion to ab_proportion:
    // association tested WITHIN strata, evidence pooled with per-stratum
    // terms quantized to integer 1e-9 units before the sums
    // (Experiment.cmhStratified scaladoc).
    Entry(
      "ab_cmh_stratified",
      (s, dir) => {
        val units = perHousehold(s, dir)
          .withColumn("stratum", stratumCol)
          .select(col("stratum"),
            when(HashSplit.bucket(col("household_key"), 2) === 0,
              lit("control")).otherwise(lit("treatment")).as("arm"),
            when(col("y") > 1000000, 1).otherwise(0).as("converted"))
        Experiment.cmhStratified(units)
      },
      Some(s"""WITH $unitsCtes,
        |u AS (
        |  SELECT stratum,
        |    CASE WHEN ${HashSplit.bucketSql("household_key", 2)} = 0
        |      THEN 'control' ELSE 'treatment' END AS arm,
        |    CASE WHEN y > 1000000 THEN 1 ELSE 0 END AS converted
        |  FROM strat)
        |${Experiment.cmhStratifiedSql("u")}""".stripMargin)),

    // Weight-of-evidence / information value over the brand indicators —
    // the scorecard encoder+screen; smoothed shares, ln terms quantized
    // to 9dp decimals before the exact IV sum (Screen.woeIv scaladoc).
    Entry(
      "woe_iv",
      (s, dir) => Screen.woeIv(brandScreenRows(s, dir)),
      Some(s"""WITH $screenCtCtes
        |${Screen.woeIvSql("ct")}""".stripMargin)),

    // Weekly-spend autocorrelation at lags 1..8: after normalizing to
    // integer 1e-4 money units every statistic is ONE division of exact
    // int128 products (SeriesStats scaladoc — scale-0 casts are the only
    // decimal→double conversions both engines single-round identically).
    Entry(
      "spend_acf",
      (s, dir) => SeriesStats.acf(weeklySpend(s, dir), maxLag = 8),
      Some(s"""WITH $weeklyCtes,
        |tot AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(ix) AS HUGEINT) AS sx,
        |    CAST(SUM(ix * ix) AS HUGEINT) AS ssq
        |  FROM si),
        |lg AS (SELECT CAST(range AS BIGINT) + 1 AS lag FROM range(8)),
        |pr AS (
        |  SELECT lag, COUNT(*) AS n_pairs,
        |    CAST(SUM(a.ix) AS HUGEINT) AS s1,
        |    CAST(SUM(b.ix) AS HUGEINT) AS s2,
        |    CAST(SUM(a.ix * b.ix) AS HUGEINT) AS c
        |  FROM lg CROSS JOIN si a JOIN si b ON b.t = a.t + lg.lag
        |  GROUP BY lag)
        |SELECT lag, n_pairs,
        |  CAST(n_pairs * c - s1 * s2 AS DOUBLE)
        |    / CAST(n * ssq - sx * sx AS DOUBLE) AS acf
        |FROM pr CROSS JOIN tot
        |ORDER BY lag""".stripMargin)),

    // CUSUM binary-segmentation changepoint on the weekly spend series:
    // the split maximizing (n·S_t − t·S_n)²/(n·t·(n−t)) — exact integer
    // candidates, deterministic argmax, smallest index on ties.
    Entry(
      "spend_changepoint",
      (s, dir) => SeriesStats.changepoint(weeklySpend(s, dir)),
      Some(s"""WITH $weeklyCtes,
        |pre AS (
        |  SELECT t, ROW_NUMBER() OVER (ORDER BY t) AS i,
        |    CAST(SUM(ix) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |      AS HUGEINT) AS st,
        |    COUNT(*) OVER () AS n,
        |    CAST(SUM(ix) OVER () AS HUGEINT) AS sn
        |  FROM si),
        |cand AS (
        |  SELECT *,
        |    CAST((n * st - i * sn) * (n * st - i * sn) AS DOUBLE)
        |      / CAST(n * i * (n - i) AS DOUBLE) AS tsq_i
        |  FROM pre WHERE i < n),
        |mx AS (SELECT MAX(tsq_i) AS mx FROM cand)
        |SELECT i AS t_split, t AS split_t_value, n,
        |  CAST(st AS DOUBLE) / (CAST(i AS DOUBLE) * 10000.0) AS mean_before,
        |  CAST(sn - st AS DOUBLE) / (CAST(n - i AS DOUBLE) * 10000.0)
        |    AS mean_after,
        |  tsq_i / 1.0e8 AS tsq
        |FROM cand, mx WHERE tsq_i = mx.mx
        |ORDER BY i LIMIT 1""".stripMargin)),

    // Split-conformal prediction-interval audit (alpha = 10%): train the
    // per-stratum mean predictor on the train split, calibrate the
    // residual quantile on cal (k-th order statistic via the
    // range-partitioned prefix machinery), audit empirical coverage on
    // test — expected >= 0.90 under exchangeability (Conformal scaladoc).
    Entry(
      "conformal_interval",
      (s, dir) => {
        val b = HashSplit.bucket(col("household_key"), 1000)
        val units = perHousehold(s, dir)
          .withColumn("stratum", stratumCol)
          .withColumn("split",
            when(b < 600, "train").when(b < 800, "cal").otherwise("test"))
        graft.ops.Conformal.splitConformal(units, alphaPct = 10)
          .orderBy("stratum")
      },
      Some(s"""WITH $unitsCtes,
        |sp AS (
        |  SELECT *, CASE WHEN b < 600 THEN 'train'
        |    WHEN b < 800 THEN 'cal' ELSE 'test' END AS split
        |  FROM (SELECT *, ${HashSplit.bucketSql("household_key", 1000)} AS b
        |        FROM strat)),
        |mu AS (
        |  SELECT stratum,
        |    CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS mu
        |  FROM sp WHERE split = 'train' GROUP BY stratum),
        |wr AS (
        |  SELECT sp.stratum, sp.split, mu.mu,
        |    ABS(CAST(y AS DOUBLE) - mu.mu) AS r
        |  FROM sp LEFT JOIN mu ON sp.stratum = mu.stratum
        |  WHERE split <> 'train'),
        |bv AS (SELECT r, COUNT(*) AS cnt FROM wr
        |       WHERE split = 'cal' AND r IS NOT NULL GROUP BY r),
        |cu AS (
        |  SELECT r, cnt,
        |    CAST(SUM(cnt) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER () AS BIGINT) AS n
        |  FROM bv),
        |q AS (
        |  SELECT MIN(r) AS q_resid FROM cu
        |  WHERE cum >= ((n + 1) * 90 + 99) // 100
        |    AND cum - cnt < ((n + 1) * 90 + 99) // 100),
        |per AS (
        |  SELECT stratum, COUNT(*) AS n_test,
        |    CASE WHEN MAX(mu) IS NOT NULL THEN
        |      CAST(SUM(CASE WHEN q.q_resid IS NULL OR r <= q.q_resid
        |        THEN 1 ELSE 0 END) AS BIGINT) END AS covered,
        |    MAX(q.q_resid) AS q_resid
        |  FROM wr, q WHERE split = 'test' GROUP BY stratum)
        |SELECT stratum, n_test, covered,
        |  CAST(covered AS DOUBLE) / CAST(n_test AS DOUBLE) AS coverage,
        |  q_resid
        |FROM per
        |UNION ALL
        |SELECT '__all__', CAST(SUM(n_test) AS BIGINT),
        |  CAST(SUM(covered) AS BIGINT),
        |  CAST(SUM(covered) AS DOUBLE) / CAST(SUM(n_test) AS DOUBLE),
        |  MAX(q_resid)
        |FROM per
        |ORDER BY stratum""".stripMargin)),

    // Per-commodity top-p (nucleus) truncation: the smallest
    // spend-descending product prefix carrying 80% of each commodity's
    // spend — keep membership decided in exact integer-scaled decimal
    // arithmetic, never doubles (TopShare scaladoc).
    Entry(
      "nucleus_per_group",
      (s, dir) => {
        val txc = graft.features.FeatureBuilder.txWithCommodity(s, dir)
        val perProd = txc.groupBy("commodity_desc", "product_id")
          .agg(sum(col("amount_paid").cast("decimal(18,4)"))
            .cast("decimal(18,4)").as("spend"))
        graft.ops.TopShare.nucleusPerGroup(perProd, Seq("commodity_desc"),
          "product_id", "spend", pPct = 80)
      },
      Some(s"""WITH ${Oracle.txCommodity},
        |pp AS (
        |  SELECT commodity_desc, product_id,
        |    CAST(SUM(CAST(amount_paid AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) AS spend
        |  FROM txc GROUP BY commodity_desc, product_id),
        |r AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
        |    CAST(SUM(spend) OVER (PARTITION BY commodity_desc
        |      ORDER BY spend DESC, product_id ROWS UNBOUNDED PRECEDING)
        |      AS DECIMAL(28,4)) AS cum,
        |    CAST(SUM(spend) OVER (PARTITION BY commodity_desc)
        |      AS DECIMAL(28,4)) AS tot
        |  FROM pp
        |  WINDOW w AS (PARTITION BY commodity_desc
        |    ORDER BY spend DESC, product_id))
        |SELECT commodity_desc, product_id, spend, rank,
        |  ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 9) AS cum_share
        |FROM r WHERE (cum - spend) * 100 < tot * 80""".stripMargin)),

    // Per-commodity OLS weekly-spend trend — slope/intercept/R² as
    // exact-int128 ratios after 1e-4 unit normalization, the parametric
    // companion to theil_sen_trend (SeriesStats.olsPerGroup scaladoc).
    Entry(
      "spend_ols_trend",
      (s, dir) => {
        val txc = graft.features.FeatureBuilder.txWithCommodity(s, dir)
        val (lo, _) = Retail.dayBounds(s, dir)
        val wkly = txc.groupBy(col("commodity_desc").as("group"),
            expr(s"datediff(day, DATE '$lo') div 7").as("t"))
          .agg(sum(col("amount_paid").cast("decimal(18,4)"))
            .cast("decimal(18,4)").as("x"))
        SeriesStats.olsPerGroup(wkly)
      },
      Some(s"""WITH ${Oracle.txCommodity},
        |gb2 AS (SELECT min(day) AS lo FROM tx),
        |wk AS (
        |  SELECT commodity_desc AS "group",
        |    CAST((t.day - g.lo) // 7 AS BIGINT) AS t,
        |    CAST(SUM(CAST(amount_paid AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) AS x
        |  FROM txc t CROSS JOIN gb2 g
        |  GROUP BY commodity_desc, CAST((t.day - g.lo) // 7 AS BIGINT)),
        |si AS (SELECT "group", t, CAST(x * 10000 AS HUGEINT) AS iy FROM wk),
        |m AS (
        |  SELECT "group", COUNT(*) AS n,
        |    CAST(SUM(t) AS HUGEINT) AS st,
        |    CAST(SUM(t * t) AS HUGEINT) AS stt,
        |    CAST(SUM(iy) AS HUGEINT) AS sy,
        |    CAST(SUM(t * iy) AS HUGEINT) AS sty,
        |    CAST(SUM(iy * iy) AS HUGEINT) AS syy
        |  FROM si GROUP BY "group")
        |SELECT "group", n,
        |  CASE WHEN n * stt - st * st <> 0 THEN
        |    CAST(n * sty - st * sy AS DOUBLE)
        |      / CAST(n * stt - st * st AS DOUBLE) / 10000.0 END AS slope,
        |  CAST(sy AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0)
        |    - (CASE WHEN n * stt - st * st <> 0 THEN
        |        CAST(n * sty - st * sy AS DOUBLE)
        |          / CAST(n * stt - st * st AS DOUBLE) / 10000.0 END)
        |      * (CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) AS intercept,
        |  CASE WHEN n * stt - st * st <> 0 AND n * syy - sy * sy <> 0 THEN
        |    CAST((n * sty - st * sy) * (n * sty - st * sy) AS DOUBLE)
        |      / CAST((n * stt - st * st) * (n * syy - sy * sy) AS DOUBLE)
        |  END AS r2
        |FROM m ORDER BY "group"""".stripMargin)))
}
