package graft.queriesdef

import java.sql.Date
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryRegistry.Entry
import graft.features.FeatureBuilder
import graft.labels.LabelBuilder
import graft.ops.{CapPerGroup, Commodities, ModelEval}

/** Model-evaluation queries (distributed AUC / lift / calibration —
  * replacing the reference's driver-side sklearn evaluation,
  * `04b_Task__Model_Training.py:254-256,298-300`) plus negative sampling,
  * the scale path for the labeled-universe cross join.
  *
  * The evaluation operators need a score column that is deterministic
  * across engines (model probabilities are not: MLlib's fit is
  * float-order dependent), so the shared spine scores each (household,
  * commodity) label row with a purely relational propensity heuristic:
  * the share of the household's historical baskets (day ≤ cutoff) that
  * contained the commodity, rounded to 9 decimals. That is a real
  * baseline score — "how often did they buy it before" — and every
  * downstream rank/bin statistic over it is oracle-exact.
  */
object EvalQueries {

  /** (household_key, commodity_desc, purchased, score) — labels joined
    * with the basket-share heuristic score over pre-cutoff history.
    */
  private def scoredLabels(s: SparkSession, dir: String): DataFrame = {
    val txc = FeatureBuilder.txWithCommodity(s, dir)
    val (_, cur) = graft.core.Retail.dayBounds(s, dir)
    val fed = cur.minusDays(LabelBuilder.horizonDays)
    val cts = Commodities.commoditiesToScore(s, dir)
    val labels = LabelBuilder.labels(txc, cts, fed)
    val hist = txc.filter(col("day") <= lit(Date.valueOf(fed)))
    val hh = hist.groupBy("household_key")
      .agg(countDistinct(col("basket_id")).as("total_baskets"))
    // pair-grain distinct baskets only for the ~10 scored commodities:
    // the semi-join prunes the aggregate's input, not its correctness
    // (labels' left join would drop unscored commodities anyway)
    val pair = hist
      .join(broadcast(cts.select("commodity_desc")),
        Seq("commodity_desc"), "left_semi")
      .groupBy("household_key", "commodity_desc")
      .agg(countDistinct(col("basket_id")).as("pos_baskets"))
    labels
      .join(hh, Seq("household_key"))
      .join(pair, Seq("household_key", "commodity_desc"), "left_outer")
      .select(col("household_key"), col("commodity_desc"), col("purchased"),
        round(coalesce(
          col("pos_baskets").cast("double") / col("total_baskets").cast("double"),
          lit(0.0)), 9).as("score"),
        // raw ingredients carried for the feature-screening query; auc/
        // lift/calibration consumers ignore them
        col("total_baskets"),
        coalesce(col("pos_baskets"), lit(0L)).as("pos_baskets"))
  }

  /** The matching DuckDB CTE chain ending in `scored`. */
  private val scoredCtes: String =
    s"""${Oracle.txCommodity}, ${TrainScoreQueries.labelsCtes},
       |hist AS (SELECT t.* FROM txc t CROSS JOIN gb WHERE t.day <= gb.cur - 30),
       |hh AS (
       |  SELECT household_key, COUNT(DISTINCT basket_id) AS total_baskets
       |  FROM hist GROUP BY household_key),
       |pair AS (
       |  SELECT household_key, commodity_desc,
       |    COUNT(DISTINCT basket_id) AS pos_baskets
       |  FROM hist
       |  WHERE commodity_desc IN (SELECT commodity_desc FROM cts)
       |  GROUP BY household_key, commodity_desc),
       |scored AS (
       |  SELECT l.household_key, l.commodity_desc, l.purchased,
       |    ROUND(COALESCE(
       |      CAST(p.pos_baskets AS DOUBLE) / CAST(h.total_baskets AS DOUBLE),
       |      0.0), 9) AS score,
       |    h.total_baskets,
       |    COALESCE(p.pos_baskets, 0) AS pos_baskets
       |  FROM labels l
       |  JOIN hh h ON l.household_key = h.household_key
       |  LEFT JOIN pair p ON l.household_key = p.household_key
       |    AND l.commodity_desc = p.commodity_desc)""".stripMargin

  def entries: Seq[Entry] = Seq(

    // Exact ROC AUC of the basket-share score against next-30d purchase.
    // 2U accumulates as HUGEINT/DECIMAL(38,0) on the two sides — both
    // exact int128 — so the single closing division sees the same integer.
    Entry(
      "model_auc",
      (s, dir) => ModelEval.auc(scoredLabels(s, dir)),
      Some(s"""WITH $scoredCtes,
        |ps AS (
        |  SELECT score AS s, COUNT(*) AS n,
        |    CAST(SUM(purchased) AS BIGINT) AS pos
        |  FROM scored GROUP BY score),
        |ps2 AS (SELECT s, n, pos, n - pos AS neg FROM ps),
        |cum AS (
        |  SELECT pos, neg, COALESCE(CAST(SUM(neg) OVER (ORDER BY s ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |    AS neg_below
        |  FROM ps2)
        |SELECT
        |  ROUND(CAST(SUM(CAST(pos AS HUGEINT) *
        |      (CAST(neg_below AS HUGEINT) * 2 + CAST(neg AS HUGEINT)))
        |      AS DOUBLE)
        |    / (CAST(SUM(pos) AS DOUBLE) * CAST(SUM(neg) AS DOUBLE) * 2.0), 9)
        |    AS auc,
        |  CAST(SUM(pos) AS BIGINT) AS pos,
        |  CAST(SUM(neg) AS BIGINT) AS neg
        |FROM cum""".stripMargin)),

    // Gains/lift deciles: ties share a bin (exact integer DIV of the
    // rows-above rank), response/capture/lift with pinned association.
    Entry(
      "model_lift",
      (s, dir) => ModelEval.liftTable(scoredLabels(s, dir), nBins = 10),
      Some(s"""WITH $scoredCtes,
        |ps AS (
        |  SELECT score AS s, COUNT(*) AS n,
        |    CAST(SUM(purchased) AS BIGINT) AS pos
        |  FROM scored GROUP BY score),
        |c AS (
        |  SELECT s, n, pos,
        |    COALESCE(CAST(SUM(n) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      AS rows_above,
        |    CAST(SUM(n) OVER () AS BIGINT) AS total,
        |    CAST(SUM(pos) OVER () AS BIGINT) AS total_pos
        |  FROM ps),
        |b AS (
        |  SELECT CAST((rows_above * 10) // total AS INT) AS bin, n, pos,
        |    total, total_pos
        |  FROM c),
        |bb AS (
        |  SELECT bin, CAST(SUM(n) AS BIGINT) AS rows,
        |    CAST(SUM(pos) AS BIGINT) AS positives,
        |    MAX(total) AS total, MAX(total_pos) AS total_pos
        |  FROM b GROUP BY bin)
        |SELECT bin, rows, positives,
        |  ROUND(CAST(positives AS DOUBLE) / CAST(rows AS DOUBLE), 9)
        |    AS response_rate,
        |  ROUND(CAST(CAST(SUM(positives) OVER (ORDER BY bin ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS DOUBLE) / CAST(total_pos AS DOUBLE), 9) AS cum_capture,
        |  ROUND((CAST(positives AS DOUBLE) / CAST(rows AS DOUBLE)) /
        |    (CAST(total_pos AS DOUBLE) / CAST(total AS DOUBLE)), 9) AS lift
        |FROM bb""".stripMargin)),

    // Calibration bins: mean predicted score vs observed positive rate
    // per equal-width score bin.
    Entry(
      "model_calibration",
      (s, dir) => ModelEval.calibration(scoredLabels(s, dir), nBins = 10),
      Some(s"""WITH $scoredCtes
        |SELECT
        |  LEAST(CAST(FLOOR(score * 10) AS INT), 9) AS bin,
        |  COUNT(*) AS rows,
        |  CAST(SUM(purchased) AS BIGINT) AS positives,
        |  ROUND(CAST(SUM(CAST(score AS DECIMAL(18,9))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 9) AS mean_score,
        |  ROUND(CAST(SUM(purchased) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
        |    AS pos_rate
        |FROM scored
        |GROUP BY LEAST(CAST(FLOOR(score * 10) AS INT), 9)""".stripMargin)),

    // Negative sampling: keep every positive label, and per household the
    // 3 md5-ranked negatives — the scale path for the labeled universe
    // (bounded at P + 3·|households| rows instead of households ×
    // commodities; at catalog scale the cross join is the bottleneck).
    // Selection is content-hash ranked (CapPerGroup), so the sample is
    // stable across reruns and engine-verifiable.
    Entry(
      "negative_sample",
      (s, dir) => {
        val txc = FeatureBuilder.txWithCommodity(s, dir)
        val (_, cur) = graft.core.Retail.dayBounds(s, dir)
        val labels = LabelBuilder.labels(txc,
          Commodities.commoditiesToScore(s, dir),
          cur.minusDays(LabelBuilder.horizonDays))
        labels.filter(col("purchased") === 1)
          .unionByName(CapPerGroup.cap(
            labels.filter(col("purchased") === 0),
            Seq("household_key"), "commodity_desc", maxPerGroup = 3))
      },
      Some(s"""WITH ${Oracle.txCommodity}, ${TrainScoreQueries.labelsCtes}
        |SELECT household_key, commodity_desc, day, purchased
        |FROM labels WHERE purchased = 1
        |UNION ALL
        |SELECT household_key, commodity_desc, day, purchased FROM (
        |  SELECT *,
        |    ${CapPerGroup.rankSql(Seq("household_key"), "commodity_desc")}
        |      AS rn
        |  FROM labels WHERE purchased = 0) t
        |WHERE rn <= 3""".stripMargin)),

    // Univariate feature screening: melt three candidate signals to
    // (feature, value, label) and rank each feature's separating power
    // with the per-group exact AUC in ONE plan (ModelEval.aucByGroup) —
    // the distributed replacement for a driver-side sklearn screening
    // loop over N features.
    Entry(
      "feature_auc_screen",
      (s, dir) => {
        val base = scoredLabels(s, dir)
        val melted = base.select(
          expr("""stack(3,
            |'basket_share', score,
            |'total_baskets', CAST(total_baskets AS DOUBLE),
            |'pos_baskets', CAST(pos_baskets AS DOUBLE))
            |AS (feature, value)""".stripMargin),
          col("purchased"))
        ModelEval.aucByGroup(melted, Seq("feature"), "value", "purchased")
      },
      Some(s"""WITH $scoredCtes,
        |melted AS (
        |  SELECT 'basket_share' AS feature, score AS v, purchased
        |  FROM scored
        |  UNION ALL
        |  SELECT 'total_baskets', CAST(total_baskets AS DOUBLE), purchased
        |  FROM scored
        |  UNION ALL
        |  SELECT 'pos_baskets', CAST(pos_baskets AS DOUBLE), purchased
        |  FROM scored),
        |ps AS (
        |  SELECT feature, v AS s, COUNT(*) AS n,
        |    CAST(SUM(purchased) AS BIGINT) AS pos
        |  FROM melted GROUP BY feature, v),
        |ps2 AS (SELECT feature, s, n, pos, n - pos AS neg FROM ps),
        |cum AS (
        |  SELECT feature, pos, neg,
        |    COALESCE(CAST(SUM(neg) OVER (PARTITION BY feature ORDER BY s ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS neg_below
        |  FROM ps2)
        |SELECT feature,
        |  ROUND(CAST(SUM(CAST(pos AS HUGEINT) *
        |      (CAST(neg_below AS HUGEINT) * 2 + CAST(neg AS HUGEINT)))
        |      AS DOUBLE)
        |    / (CAST(SUM(pos) AS DOUBLE) * CAST(SUM(neg) AS DOUBLE) * 2.0), 9)
        |    AS auc,
        |  CAST(SUM(pos) AS BIGINT) AS pos,
        |  CAST(SUM(neg) AS BIGINT) AS neg
        |FROM cum GROUP BY feature""".stripMargin)))
}
