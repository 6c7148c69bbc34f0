package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budgeted corpus selection: take documents per source, in a
  * deterministic content-hash order, until each source's TOKEN budget is
  * exhausted — how training mixtures are actually specified ("300 B
  * tokens of web, 50 B of code"), vs. the row-ratio mixing of
  * [[MixSources]]. A document is kept iff the tokens BEFORE it in its
  * source's hash order are still under the budget, so the first document
  * crossing the boundary is included and the cut is reproducible:
  * membership is a pure function of (key hashes, token counts, budget) —
  * stable across reruns, engines, and partitionings.
  *
  * Scale shape: the per-source running sum is NOT one window task per
  * source (a 100 TB web crawl in one source = one task). The hash order
  * is split into `shards` contiguous bucket ranges; each (source, shard)
  * computes its local running sum in parallel, and a tiny per-shard
  * total frame (|sources| × `shards` rows) supplies the exclusive
  * offsets — the same two-phase decomposition as [[Ntile]], keyed by an
  * order-aligned shard (shard = bucket range, so shard order concatenates
  * to exactly the global per-source order). The oracle renders the
  * single-window form in DuckDB; TokenBudgetSpec pins shard-count
  * invariance.
  */
object TokenBudget {

  /** Keep rows of `df` per `sourceCol` until `budgets` tokens (from
    * `tokensCol`) are reached, hash-ordered by `keyCol`. Sources absent
    * from `budgets` are dropped. Output: input columns + `tokens_before`
    * (the exclusive running total at selection time).
    */
  def select(df: DataFrame, keyCol: String, sourceCol: String,
      tokensCol: String, budgets: Map[String, Long],
      shards: Int = 16, buckets: Int = 1000): DataFrame = {
    require(budgets.nonEmpty, "TokenBudget.select: at least one source budget")
    require(shards >= 1 && shards <= buckets,
      s"TokenBudget.select: shards ($shards) must be in [1, $buckets]")
    budgets.foreach { case (s, b) =>
      require(b >= 0, s"TokenBudget.select: negative budget for $s") }
    // shard = contiguous bucket range; ranges need not be equal-sized for
    // shard order to concatenate to the global bucket order
    val span = (buckets + shards - 1) / shards
    val budgetCol = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (s, b)) => when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    val based = df
      .withColumn("__budget", budgetCol)
      .filter(col("__budget").isNotNull)
      .withColumn("__bucket", HashSplit.bucket(col(keyCol), buckets))
      .withColumn("__shard", expr(s"__bucket div $span"))
    // local exclusive running sum within (source, shard), hash order
    val local = Window.partitionBy(col(sourceCol), col("__shard"))
      .orderBy(col("__bucket"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = based.withColumn("__local_before",
      coalesce(sum(col(tokensCol)).over(local), lit(0L)))
    // tiny frame: per-shard totals → exclusive per-source shard offsets
    val offsets = based.groupBy(col(sourceCol), col("__shard"))
      .agg(sum(col(tokensCol)).as("__shard_tokens"))
      .withColumn("__offset", coalesce(
        sum(col("__shard_tokens")).over(
          Window.partitionBy(col(sourceCol)).orderBy(col("__shard"))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(sourceCol), col("__shard"), col("__offset"))
    withLocal
      .join(broadcast(offsets), Seq(sourceCol, "__shard"))
      .withColumn("tokens_before", col("__offset") + col("__local_before"))
      .filter(col("tokens_before") < col("__budget"))
      .select(df.columns.map(col) :+ col("tokens_before"): _*)
  }
}
