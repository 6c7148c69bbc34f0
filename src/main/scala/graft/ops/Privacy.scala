package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private aggregate release — seeded, engine-exact.
  *
  * A training-data platform publishes corpus statistics (counts per
  * source, spend per segment) outside its trust boundary; ε-DP with
  * Laplace noise is the standard release mechanism (Dwork et al. 2006).
  * The reference has no analogue (its outputs stay inside the workspace
  * — SURVEY.md §1); at platform scale the release step is a first-class
  * pipeline op.
  *
  * Noise here is SEEDED AND CONTENT-DERIVED, not drawn from an RNG: the
  * uniform is the first 48 bits of md5(seed | group-key) — the
  * [[HashSplit]] idiom — mapped through the Laplace inverse CDF
  *
  *   noise = −b · sign(u − ½) · ln(1 − 2|u − ½|),   b = Δ/ε
  *
  * so the released value is a pure function of (data, seed): independent
  * of row order, partitioning, and engine — the same noise renders in
  * DuckDB SQL and the whole release hash-matches. The one transcendental
  * (`ln`) is rounded to 9 dp before use (the TextAnalysis LM-score
  * treatment), everything else is exact-int/decimal arithmetic plus a
  * fixed sequence of IEEE ops.
  *
  * THE PRIVACY CAVEAT, stated plainly: a content-derived u means the
  * noise is a deterministic function of the group key and seed. That is
  * exactly what reproducible pipelines want (re-running a release does
  * not leak a fresh noise draw — the "averaging attack" over reruns is
  * structurally impossible), but it makes the SEED part of the privacy
  * barrier: publish the seed and the noise can be subtracted. Operate it
  * like a key, rotate per release epoch. `n_exact` columns ride along
  * for the engine's own audit/oracle; a real release publishes ONLY the
  * `*_dp` columns.
  *
  * Scale shape: one map-combinable hash aggregate (plus one pre-
  * aggregate for the clipped sum) and per-ROW closed-form noise on the
  * group-sized result — no shuffle beyond the aggregates, no collect,
  * no state.
  *
  * Group keys must render identically as strings on both engines —
  * callers pass string-typed keys (the module's md5-key convention).
  * NULL keys are coalesced to the `<NULL>` sentinel on BOTH engines
  * (Spark's concat_ws silently skips nulls while DuckDB's `||`
  * propagates them — without the shared sentinel a null-keyed group's
  * noise would be computed from different strings, or go NULL outright
  * on the oracle side).
  */
object Privacy {

  /** Canonical null sentinel for key rendering across engines. */
  val NullKey = "<NULL>"

  private def esc(s: String): String = s.replace("'", "''")

  /** Uniform in (0,1) from the first 48 md5 bits of (seed | key):
    * (v + 0.5) / 2⁴⁸ — never exactly 0, ½, or 1, so sign and ln below
    * are always well-defined.
    */
  def hashUniform(key: Column, seed: String): Column =
    (conv(substring(md5(concat_ws("|", lit(seed),
        coalesce(key.cast("string"), lit(NullKey)))), 1, 12), 16, 10)
      .cast("double") + lit(0.5)) / lit(281474976710656.0)

  private def hashUniformSql(keyExpr: String, seed: String): String =
    s"(CAST(('0x' || substr(md5('${esc(seed)}' || '|' || " +
      s"COALESCE(CAST($keyExpr AS VARCHAR), '$NullKey')), 1, 12)) " +
      "AS BIGINT) + 0.5) / 281474976710656.0"

  /** DuckDB rendering of the MULTI-column noise key, coalescing each
    * column independently — matching the Spark side's per-column
    * `coalesce(...cast("string"), NullKey)` before `concat_ws("")`. The
    * outer COALESCE inside [[hashUniformSql]] only covers a whole-key
    * NULL, so a two-column key with one null component would render
    * `'<NULL>a'` on Spark but `'<NULL>'` through a naive `c1 || c2`
    * rendering (SQL `||` is null-propagating). Pass this helper's output
    * as the `keyExpr` of [[laplaceNoiseSql]] whenever the key has more
    * than one column; the single-column renderings ([[dpCountsSql]],
    * [[dpSumsSql]]) are unaffected (per-column == whole-key for one
    * column).
    */
  def keySql(groupCols: Seq[String]): String =
    groupCols.map(c => s"COALESCE(CAST($c AS VARCHAR), '$NullKey')")
      .mkString(" || ")

  /** Laplace(0, b) noise via the inverse CDF over [[hashUniform]]; the ln
    * is 9-dp-quantized, the rest is a fixed IEEE op sequence.
    */
  def laplaceNoise(key: Column, seed: String, b: Column): Column = {
    val d = hashUniform(key, seed) - lit(0.5)
    -b * signum(d) * round(log(lit(1.0) - lit(2.0) * abs(d)), 9)
  }

  /** The identical noise as DuckDB SQL. `keyExpr` must be a single
    * column/expression, or a multi-column key pre-rendered through
    * [[keySql]] — a raw `c1 || c2` concatenation diverges from the Spark
    * side when any component is NULL (see [[keySql]]).
    */
  def laplaceNoiseSql(keyExpr: String, seed: String, bExpr: String): String = {
    val u = hashUniformSql(keyExpr, seed)
    s"(-($bExpr) * sign($u - 0.5) * round(ln(1.0 - 2.0 * abs($u - 0.5)), 9))"
  }

  /** ε-DP group counts (sensitivity 1 when each underlying unit
    * contributes one row per group — enforce upstream with a distinct).
    * `epsilonPct` is ε in percent (100 = ε 1.0) so b = 100/εPct stays a
    * ratio of exact integers. Output: groupCols, n_exact, n_dp.
    */
  def dpCounts(df: DataFrame, groupCols: Seq[String], seed: String,
      epsilonPct: Int): DataFrame = {
    require(epsilonPct > 0, s"Privacy.dpCounts: epsilonPct > 0, got $epsilonPct")
    val b = lit(100.0) / lit(epsilonPct.toDouble)
    val key = concat_ws("", groupCols.map(c =>
      coalesce(col(c).cast("string"), lit(NullKey))): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_exact"))
      .withColumn("n_dp",
        col("n_exact").cast("double") + laplaceNoise(key, seed, b))
  }

  /** The count query's oracle rendering for ONE group column. */
  def dpCountsSql(table: String, groupCol: String, seed: String,
      epsilonPct: Int): String =
    s"""SELECT $groupCol, COUNT(*) AS n_exact,
       |  CAST(COUNT(*) AS DOUBLE) +
       |    ${laplaceNoiseSql(groupCol, seed, s"100.0 / $epsilonPct")} AS n_dp
       |FROM $table GROUP BY $groupCol""".stripMargin

  /** ε-DP group sums with bounded contribution: each contributor's total
    * within a group is clipped to [0, clip4/10⁴] money units BEFORE the
    * group sum, so the sensitivity is exactly the clip and b =
    * clip·100/εPct. Money stays DECIMAL(18,4) through both aggregates and
    * crosses to double as a SCALE-0 integer (the SeriesStats rule: DuckDB
    * double-rounds nonzero-scale decimal→double casts). Output:
    * groupCols, n_contributors, sum_clipped (exact), sum_dp.
    */
  def dpSums(df: DataFrame, groupCols: Seq[String], contributorCol: String,
      valueCol: String, clip4: Long, seed: String,
      epsilonPct: Int): DataFrame = {
    require(epsilonPct > 0 && clip4 > 0,
      s"Privacy.dpSums: positive epsilonPct/clip4, got $epsilonPct/$clip4")
    val g = groupCols.map(col)
    val perContrib = df
      .groupBy(g :+ col(contributorCol).as("__c"): _*)
      .agg(sum(col(valueCol).cast("decimal(18,4)")).as("__s"))
      // clip in integer 1e-4 units: exact on both engines
      .withColumn("__s4", least(
        (col("__s") * 10000).cast("decimal(38,0)"), lit(clip4)))
      .withColumn("__s4", greatest(col("__s4"), lit(0L).cast("decimal(38,0)")))
    val b = lit(clip4.toDouble / 10000.0) * lit(100.0) / lit(epsilonPct.toDouble)
    val key = concat_ws("", groupCols.map(c =>
      coalesce(col(c).cast("string"), lit(NullKey))): _*)
    perContrib.groupBy(g: _*)
      .agg(count(lit(1)).as("n_contributors"),
        sum(col("__s4")).cast("decimal(38,0)").as("__sum4"))
      .withColumn("sum_clipped", col("__sum4").cast("double") / lit(10000.0))
      .withColumn("sum_dp", col("sum_clipped") + laplaceNoise(key, seed, b))
      .drop("__sum4")
  }

  /** The sum query's oracle rendering for ONE group column. */
  def dpSumsSql(table: String, groupCol: String, contributorCol: String,
      valueCol: String, clip4: Long, seed: String, epsilonPct: Int): String =
    s"""WITH pc AS (
       |  SELECT $groupCol, $contributorCol,
       |    GREATEST(LEAST(CAST(SUM(CAST($valueCol AS DECIMAL(18,4))) * 10000
       |      AS DECIMAL(38,0)), $clip4), 0) AS s4
       |  FROM $table GROUP BY $groupCol, $contributorCol)
       |SELECT $groupCol, COUNT(*) AS n_contributors,
       |  CAST(CAST(SUM(s4) AS DECIMAL(38,0)) AS DOUBLE) / 10000.0
       |    AS sum_clipped,
       |  CAST(CAST(SUM(s4) AS DECIMAL(38,0)) AS DOUBLE) / 10000.0 +
       |    ${laplaceNoiseSql(groupCol, seed,
            s"${clip4.toDouble / 10000.0} * 100.0 / $epsilonPct")} AS sum_dp
       |FROM pc GROUP BY $groupCol""".stripMargin
}
