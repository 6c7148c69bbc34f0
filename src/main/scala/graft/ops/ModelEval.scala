package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed model-evaluation aggregates: exact ROC AUC, a gains/lift
  * table, and calibration bins.
  *
  * The reference evaluates models driver-side with sklearn over a pandas
  * collect (`04b_Task__Model_Training.py:254-256,298-300` — average
  * precision, balanced accuracy, MCC on the collected validation frame).
  * That shape caps evaluation at driver memory; scoring 100 TB and
  * collecting is not an option. These operators compute the standard
  * offline-evaluation artifacts as distributed aggregations whose only
  * driver-sized state is the per-distinct-score table:
  *
  *   scored rows ──hash agg on score──▶ (score, n, pos)   [data-sized pass]
  *        ──range-partitioned prefix sums──▶ cumulative counts
  *        ──closed-form arithmetic──▶ AUC / bins / lift      [exact]
  *
  * Scores are expected pre-rounded (9 decimals by engine convention) so
  * the distinct-score table is bounded and tie structure is identical in
  * any engine replaying the math. All rank/cumulative arithmetic stays in
  * integer/decimal space until a single final division, so results are
  * independent of partition count and combine order.
  *
  * The global cumulative counts over the distinct-score table go through
  * [[RangePrefix.prefixSums]] (NOT a bare `Window.orderBy`, which plans
  * to a single task): the shipped queries' score domains are bounded
  * (9-dp ratios), but as a GENERIC operator a continuous score column
  * makes the distinct-score table data-sized, and these aggregates must
  * stay scale-safe there too — the same reasoning as `Drift.exactKs`.
  */
object ModelEval {

  /** Exact ROC AUC by rank statistic (Mann-Whitney U with the standard
    * tie correction — identical to the trapezoidal area under the ROC
    * curve). One row: (auc DOUBLE, pos BIGINT, neg BIGINT).
    *
    * AUC = Σ_s pos_s · (negBelow_s + ½·neg_s) / (P·N), accumulated as the
    * exact integer 2·U = Σ pos_s·(2·negBelow_s + neg_s) in DECIMAL(38,0)
    * (a long overflows once P·N exceeds ~9e18 — true corpus scale), then
    * one double division. Cumulative negatives come from the
    * range-partitioned prefix machinery over the DISTINCT-score aggregate
    * — never the data, and never a single-task global window.
    */
  def auc(scored: DataFrame, scoreCol: String = "score",
      labelCol: String = "purchased"): DataFrame = {
    val perScore = scored
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("pos"))
      .withColumn("neg", col("n") - col("pos"))
    // s is DISTINCT after the groupBy, so ordering by it alone is total
    val cum = RangePrefix.prefixSums(perScore, Seq(col("s").asc), Seq("neg"))
      .withColumn("neg_below", col("neg_cum") - col("neg"))
    cum.agg(
        sum(col("pos").cast("decimal(38,0)") *
          (col("neg_below").cast("decimal(38,0)") * 2 +
            col("neg").cast("decimal(38,0)"))).as("u2"),
        sum(col("pos")).as("p"),
        sum(col("neg")).as("nn"))
      .select(
        round(col("u2").cast("double") /
          (col("p").cast("double") * col("nn").cast("double") * 2.0d), 9)
          .as("auc"),
        col("p").as("pos"), col("nn").as("neg"))
  }

  /** Per-group exact AUC — the univariate feature-screening primitive:
    * melt candidate features to (feature, value, label) rows and one call
    * ranks every feature's separating power in a single plan. Identical
    * math to [[auc]] with the distinct-score window PARTITIONED by the
    * group columns, so no window ever sees more than one group's distinct
    * values. Output: groupCols ++ (auc, pos, neg).
    */
  def aucByGroup(scored: DataFrame, groupCols: Seq[String],
      scoreCol: String = "score", labelCol: String = "purchased"): DataFrame = {
    require(groupCols.nonEmpty, "aucByGroup: at least one group column")
    val gs = groupCols.map(col)
    val perScore = scored
      .groupBy(gs :+ col(scoreCol).as("s"): _*)
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("pos"))
      .withColumn("neg", col("n") - col("pos"))
    val asc = Window.partitionBy(gs: _*).orderBy(col("s").asc)
    val cum = perScore.withColumn("neg_below",
      coalesce(sum(col("neg")).over(
        asc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    cum.groupBy(gs: _*)
      .agg(
        sum(col("pos").cast("decimal(38,0)") *
          (col("neg_below").cast("decimal(38,0)") * 2 +
            col("neg").cast("decimal(38,0)"))).as("u2"),
        sum(col("pos")).as("p"),
        sum(col("neg")).as("nn"))
      .select(gs ++ Seq(
        round(col("u2").cast("double") /
          (col("p").cast("double") * col("nn").cast("double") * 2.0d), 9)
          .as("auc"),
        col("p").as("pos"), col("nn").as("neg")): _*)
  }

  /** Gains/lift table over `nBins` score-rank bins (highest scores in
    * bin 0). Ties never straddle a bin: a whole distinct-score group is
    * assigned the bin of its FIRST row in descending-score order
    * (`bin = floor(rowsAbove · nBins / total)` — exact integer
    * arithmetic), which is the only honest choice when equal scores are
    * indistinguishable. Output per bin: row count, positives, response
    * rate, cumulative capture of all positives, and lift vs the base
    * rate.
    */
  def liftTable(scored: DataFrame, scoreCol: String = "score",
      labelCol: String = "purchased", nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"liftTable: nBins must be positive, got $nBins")
    val perScore = scored
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("pos"))
    // rank + grand totals via the range-partitioned prefix machinery
    // (s distinct ⇒ the descending order is total)
    val binned = RangePrefix.prefixSums(perScore, Seq(col("s").desc),
        Seq("n", "pos"))
      .withColumn("rows_above", col("n_cum") - col("n"))
      .withColumn("total", col("n_tot"))
      .withColumn("total_pos", col("pos_tot"))
      // exact INTEGER division (DIV), not floor(double /): at corpus
      // scale a double quotient can land ulps below an exact integer
      // boundary and floor into the wrong bin — and differently per engine
      .withColumn("bin",
        expr(s"CAST((rows_above * $nBins) DIV total AS INT)"))
    val byBin = binned.groupBy("bin")
      .agg(sum(col("n")).as("rows"), sum(col("pos")).as("positives"),
        max(col("total")).as("total"), max(col("total_pos")).as("total_pos"))
    // byBin is exactly nBins rows (a caller CONSTANT, not data-sized), so
    // a plain cumulative window over it is fine at any scale — the same
    // control-frame exemption as RangePrefix's own per-partition offsets
    val binAsc = Window.orderBy(col("bin").asc)
    byBin
      .withColumn("cum_pos", sum(col("positives")).over(
        binAsc.rowsBetween(Window.unboundedPreceding, 0)))
      .select(
        col("bin"), col("rows"), col("positives"),
        round(col("positives").cast("double") / col("rows").cast("double"), 9)
          .as("response_rate"),
        round(col("cum_pos").cast("double") / col("total_pos").cast("double"), 9)
          .as("cum_capture"),
        round((col("positives").cast("double") / col("rows").cast("double")) /
          (col("total_pos").cast("double") / col("total").cast("double")), 9)
          .as("lift"))
  }

  /** Calibration curve over `nBins` equal-width score bins on [0, 1]:
    * per bin, the mean predicted score vs the observed positive rate.
    * The bin is a pure per-row function (`floor(score·nBins)` clamped to
    * the last bin so score = 1.0 lands inside) — no shuffle beyond the
    * final tiny aggregation; mean scores sum through DECIMAL(18,9) so the
    * result is combine-order independent.
    */
  def calibration(scored: DataFrame, scoreCol: String = "score",
      labelCol: String = "purchased", nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"calibration: nBins must be positive, got $nBins")
    val bin = least(floor(col(scoreCol) * nBins).cast("int"), lit(nBins - 1))
    scored
      .groupBy(bin.as("bin"))
      .agg(
        count(lit(1)).as("rows"),
        sum(col(scoreCol).cast("decimal(18,9)")).as("score_sum"),
        sum(col(labelCol).cast("long")).as("positives"))
      .select(
        col("bin"), col("rows"), col("positives"),
        round(col("score_sum").cast("double") / col("rows").cast("double"), 9)
          .as("mean_score"),
        round(col("positives").cast("double") / col("rows").cast("double"), 9)
          .as("pos_rate"))
  }
}
