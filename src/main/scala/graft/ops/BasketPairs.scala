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
    pairCounts(tx, minSupport)
      .select("pa", "pb", "n_pair", "na", "nb", "lift")
      .orderBy(col("n_pair").desc, col("pa"), col("pb"))
      .limit(k)
  }

  /** Directional association rules (Apriori pass 3, still one plan): each
    * surviving pair emits both orientations a→b and b→a with
    * `confidence = n_pair / n_antecedent`, kept when ≥ `minConf`. Support
    * and lift are orientation-symmetric and carried through. Top-`k` by
    * (confidence, antecedent, consequent) so the output order is
    * deterministic under ties.
    *
    * Scale: the rule derivation runs on the PAIR table (catalog²-bounded,
    * already support-pruned) — no further pass over the fact. The two
    * orientations come from one `explode` of a 2-element array, not a
    * union of two lineages.
    */
  def rules(tx: DataFrame, minSupport: Int, minConf: Double, k: Int): DataFrame = {
    require(minConf > 0 && minConf <= 1, s"bad minConf: $minConf")
    pairCounts(tx, minSupport)
      .select(explode(array(
        struct(col("pa").as("antecedent"), col("pb").as("consequent"),
          col("na").as("n_ante"), col("nb").as("n_cons"),
          col("n_pair"), col("lift")),
        struct(col("pb").as("antecedent"), col("pa").as("consequent"),
          col("nb").as("n_ante"), col("na").as("n_cons"),
          col("n_pair"), col("lift")))).as("r"))
      .select(col("r.*"))
      .withColumn("confidence",
        col("n_pair").cast("double") / col("n_ante").cast("double"))
      .filter(col("confidence") >= minConf)
      .select("antecedent", "consequent", "n_pair", "n_ante", "n_cons",
        "confidence", "lift")
      .orderBy(col("confidence").desc, col("antecedent"), col("consequent"))
      .limit(k)
  }

  /** Shared pair lineage: support-pruned canonical pairs (pa < pb) with
    * per-item and pair basket counts and lift. See object scaladoc for the
    * single-lineage shape. Public: the co-occurrence pair table is also
    * the edge source for graph analytics (ops.PageRank).
    */
  def pairCounts(tx: DataFrame, minSupport: Int): DataFrame = {
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
  }
}
