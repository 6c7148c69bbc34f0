package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join/shuffle-key skew diagnostics — the profile a data engineer runs
  * BEFORE keying a 100 TB shuffle: per candidate key, the frequency
  * distribution's shape (max key share, skew ratio vs uniform, hot-key
  * count) that decides between a plain shuffle join, a broadcast, AQE
  * skew handling, or salting (the engine's `SkewAgg`).
  *
  * Scale shape: per key column, one hash aggregate over the facts (the
  * frequency table, map-side combinable), one grand aggregate over the
  * frequencies, and one filtered re-aggregate of the frequency table for
  * the hot-key count (threshold scalar broadcast via a 1-row cross join).
  * NO sort, NO window, NO percentile — every stage is combinable, so the
  * profile itself can never become the skew problem it measures. All
  * ratios are single divisions of exact sub-2^53 integers.
  */
object KeySkew {

  /** Long-form profile: one row per key column with
    * `rows, n_keys, max_freq, avg_freq, top_share, skew_ratio`
    * (max/avg — 1.0 is perfectly uniform) and `n_hot_keys` (keys with
    * frequency ≥ `hotFactor` × average).
    */
  def profile(df: DataFrame, keyCols: Seq[String],
      hotFactor: Double = 10.0): DataFrame = {
    require(keyCols.nonEmpty, "profile: at least one key column")
    keyCols.map { k =>
      // Materialize the frequency table ONCE per key column: it feeds
      // `stats`, the hot-key re-aggregate, AND the broadcast copy of
      // `stats` inside `hot` — three references whose lineages Catalyst
      // does not unify, so without the checkpoint the fact-scale groupBy
      // executed 3× per key column (9 fact aggregations for the default
      // 3-key profile). The frequency table is |distinct keys| × 16 B —
      // executor-resident blocks at any scale.
      val freq = df.groupBy(col(k).as("__k"))
        .agg(count(lit(1)).as("f"))
        .localCheckpoint(true)
      val stats = freq.agg(
        sum(col("f")).cast("long").as("rows"),
        count(lit(1)).as("n_keys"),
        max(col("f")).as("max_freq"))
      val hot = freq.crossJoin(broadcast(stats))
        .filter(col("f").cast("double") * col("n_keys").cast("double")
          >= lit(hotFactor) * col("rows").cast("double"))
        .agg(count(lit(1)).as("n_hot_keys"))
      stats.crossJoin(broadcast(hot)).select(
        lit(k).as("key_name"),
        col("rows"), col("n_keys"), col("max_freq"),
        round(col("rows").cast("double") / col("n_keys").cast("double"), 9)
          .as("avg_freq"),
        round(col("max_freq").cast("double") / col("rows").cast("double"), 9)
          .as("top_share"),
        round(col("max_freq").cast("double") * col("n_keys").cast("double")
          / col("rows").cast("double"), 9).as("skew_ratio"),
        col("n_hot_keys"))
    }.reduce(_ unionByName _)
  }

  /** Exact self-join cardinality prediction per candidate key — the
    * planner arithmetic `|A ⋈_k A| = Σ_k f(k)²` surfaced as an operator,
    * so the pair-explosion a basket/entity self-join would produce is
    * KNOWN before anyone runs it (the quantity `BasketPairs` bounds by
    * support pruning). `amplification` compares against the uniform-key
    * ideal `n²/n_keys`: 1.0 = perfectly even keys; large = a skewed key
    * will dominate the join output. Same all-combinable shape as
    * [[profile]]; Σf² stays under 2^53 while max-frequency² × keys does
    * (~30M rows on one key before the bound matters).
    */
  def selfJoinCardinality(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "selfJoinCardinality: at least one key column")
    keyCols.map { k =>
      df.groupBy(col(k).as("__k"))
        .agg(count(lit(1)).as("f"))
        .agg(
          sum(col("f")).cast("long").as("rows"),
          count(lit(1)).as("n_keys"),
          sum(col("f") * col("f")).cast("long").as("self_join_pairs"))
        .select(
          lit(k).as("key_name"), col("rows"), col("n_keys"),
          col("self_join_pairs"),
          // uniform ideal n²/k, exact integer DIV (n² < 2^63 to ~3e9 rows)
          expr("CAST((rows * rows) DIV n_keys AS BIGINT)")
            .as("uniform_pairs"),
          round(col("self_join_pairs").cast("double")
            * col("n_keys").cast("double")
            / (col("rows").cast("double") * col("rows").cast("double")), 9)
            .as("amplification"))
    }.reduce(_ unionByName _)
  }
}
