package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair co-occurrence — the Apriori first two passes as one
  * declarative plan: per-item support counts, support pruning, then
  * canonical item pairs with support and lift. The retail staple the
  * reference's commodity analytics stop just short of
  * (`02_...py:55-66` ranks single commodities; this ranks pairs), and the
  * same shape as token co-occurrence statistics over a text corpus.
  *
  * Scale shape: a naive `pruned.join(pruned, "basket_id")` self-join
  * duplicates the whole distinct-items lineage per join side (measured: the
  * fact-level distinct ran 4× — AQE's stage cache did not unify the
  * copies). Instead the plan is single-lineage: distinct (basket, item)
  * pairs → broadcast-join the (small, catalog-sized) pruned support counts
  * → `collect_list` per basket of `struct(item, support)` → explode the
  * sorted array into ascending (pa < pb) pairs → hash-aggregate pair
  * counts. Every fact-level exchange executes once; supports ride inside
  * the struct so no post-explosion join is needed. Pair generation is
  * distributed by basket and bounded per row by (frequent items in that
  * basket)² — the Apriori anti-monotonicity bound; the support filter is
  * applied BEFORE the per-basket arrays are built. Per-item counting is a
  * hash aggregate with map-side partials, so item popularity skew never
  * concentrates rows (no per-item window buffering anywhere).
  */
object BasketPairs {

  /** Top-`k` co-occurring product pairs among products appearing in at
    * least `minSupport` distinct baskets, with support counts and lift,
    * ordered by pair support (ties: pa, pb). `tx` needs `basket_id` and
    * `product_id` columns.
    *
    * lift = P(pa ∧ pb) / (P(pa)·P(pb)) over baskets, computed as
    * `(n_pair·n_total) / (na·nb)` in one double division — the exact
    * integer products stay below 2^53 for any realistic catalog, so both
    * engines produce the identical IEEE result.
    */
  def topPairs(tx: DataFrame, minSupport: Int, k: Int): DataFrame = {
    require(minSupport >= 1 && k >= 1, s"bad args: $minSupport, $k")
    val items = tx.select("basket_id", "product_id").distinct()
    val freq = items.groupBy("product_id")
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)
    val total = tx.agg(countDistinct(col("basket_id")).as("n_total"))
    // sort_array orders the structs by product_id (first field), so the
    // i<j comprehension below emits each pair exactly once with pa < pb
    val sets = items.join(broadcast(freq), "product_id")
      .groupBy("basket_id")
      .agg(sort_array(collect_list(struct(col("product_id"), col("n_baskets"))))
        .as("ps"))
    sets
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1), y ->
          |    struct(x.product_id AS pa, y.product_id AS pb,
          |           x.n_baskets AS na, y.n_baskets AS nb))))""".stripMargin))
        .as("p"))
      .select(col("p.*"))
      .groupBy("pa", "pb", "na", "nb")
      .agg(count(lit(1)).as("n_pair"))
      .crossJoin(broadcast(total))
      .withColumn("lift",
        (col("n_pair").cast("double") * col("n_total").cast("double")) /
          (col("na").cast("double") * col("nb").cast("double")))
      .select("pa", "pb", "n_pair", "na", "nb", "lift")
      .orderBy(col("n_pair").desc, col("pa"), col("pb"))
      .limit(k)
  }
}
