package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable frequent-items sketch from daily truncated top-m partials —
  * the heavy-hitters member of the sketch family ([[QuantileSketch]]
  * histograms, the HLL distinct partials): store each day's exact top-m
  * item counts plus that day's truncation threshold, merge any date
  * window at read time with provable count bounds, never rescan history.
  *
  * Per day: exact item counts, keep the top m by (count DESC, item) and
  * record `thresh` = the (m+1)-th count (0 when the day has ≤ m items —
  * that day's partial is lossless). Merging a window gives, per candidate
  * item (= in ANY day's top-m):
  *
  *   lb = Σ counts over days where it surfaced        (certain mass)
  *   ub = lb + Σ thresh over days where it did NOT    (it could have been
  *        just under each of those days' cut)
  *
  * The true windowed count always lies in [lb, ub] — the SpaceSaving
  * merge argument, but built from per-day EXACT top-m tables, so unlike
  * SpaceSaving/Misra-Gries the result is independent of row order and
  * engine: fully DuckDB-oracle-verifiable, bounds included. An item with
  * `ub == lb` surfaced every day — its count is exact.
  *
  * Scale shape: one hash count per day (map-side combinable) + a per-day
  * rank truncated by WindowGroupLimit; everything after runs on partials
  * (≤ m rows per day). A true heavy hitter is in every day's top-m, so
  * top-k-by-lb recall tracks the m/k margin — size m a few × k.
  */
object TopKSketch {

  /** Daily partials: (dayCol, item, cnt, thresh) — the day's exact top-m
    * item counts, each row carrying the day's truncation threshold.
    */
  def dailyTopM(df: DataFrame, dayCol: String, itemCol: String,
      m: Int): DataFrame = {
    require(m > 0, s"m must be positive, got $m")
    val counts = df.groupBy(col(dayCol), col(itemCol).as("item"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(dayCol))
      .orderBy(col("cnt").desc, col("item").asc)
    val ranked = counts.withColumn("rn", row_number().over(w))
    // Single-lineage threshold attach: the old shape derived `thresh` by
    // FILTERING rn == m+1 and left-joining it back, which duplicates the
    // whole counts+window subtree (ReuseExchange does not unify across
    // the self-join's attribute dedup — the 4-full-scans lesson of
    // BasketPairs, measured here as two of the query's five CPU-heavy
    // stages). Instead keep rn <= m+1 (WindowGroupLimit prunes the
    // per-day sort to a top-(m+1) heap) and read the threshold off the
    // SAME slice with an unordered per-day window max — ≤ m+1 rows per
    // day, one lineage, no join. thresh = the (m+1)-th count when the
    // day has one, else 0 — identical to the join+fill result.
    val top = ranked.filter(col("rn") <= m + 1)
    val wd = Window.partitionBy(col(dayCol))
    top
      .withColumn("thresh", coalesce(
        max(when(col("rn") === m + 1, col("cnt"))).over(wd), lit(0L)))
      .filter(col("rn") <= m)
      .drop("rn")
  }

  /** Merge partials (any subset of days): top `k` candidates by certain
    * mass, with (lb, ub, n_days_present, exact) — `exact` when the item
    * surfaced in every stored day.
    */
  def mergeTopK(partials: DataFrame, dayCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val days = partials.select(col(dayCol), col("thresh")).distinct()
    val tot = days.agg(
      sum(col("thresh")).as("total_thresh"),
      count(lit(1)).as("n_days"))
    val perItem = partials.groupBy(col("item"))
      .agg(
        sum(col("cnt")).as("lb"),
        sum(col("thresh")).as("present_thresh"),
        count(lit(1)).as("n_days_present"))
    perItem.crossJoin(broadcast(tot))
      .select(col("item"), col("lb"),
        (col("lb") + col("total_thresh") - col("present_thresh")).as("ub"),
        col("n_days_present"),
        (col("n_days_present") === col("n_days")).as("exact"))
      .orderBy(col("lb").desc, col("item").asc)
      .limit(k)
  }
}
