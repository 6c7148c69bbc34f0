package graft.features

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Retail
import graft.silver.TransactionsAdj

/** Re-expression of the reference's `get_features` (`04a:116-561`) as a
  * single-pass, declarative feature builder.
  *
  * Reference shape: per window → filter → groupBy → ~100 `withColumn`s →
  * suffix-rename → 4-way left-join chain onto a spine → fillna.
  * Engine shape: ONE `groupBy(keys)` whose aggregate list carries the
  * window condition inside every aggregate (all 4 windows at once), then
  * one cleanup projection (cast DOUBLE + fill 0.0, `04a:556-558`/`04a:595`
  * semantics) and one ratio projection.
  *
  * Scale rationale: the reference's plan shuffles the fact 4× (once per
  * window) and then joins 4 aggregates back together (3 more shuffles on
  * the spine). This plan shuffles ONCE on the grain key; at 100 TB the
  * window conditions ride along as cheap codegen'd predicates inside the
  * partial aggregates, and parquet row-group skipping on `day >= min(all
  * window starts)` still applies via the pre-filter below. The cost is a
  * wider aggregation state (~136 columns), which is map-side partial
  * aggregation state — memory, not network.
  *
  * The multi-distinct aggregates (A3) still expand via Catalyst's
  * `RewriteDistinctAggregates` (documented hotspot, SURVEY.md §4); the
  * approximate variant (`approx_count_distinct`) is the 100 TB escape
  * hatch, kept behind a flag (`approxDistinct`) because it is not
  * oracle-exact.
  */
object FeatureBuilder {

  /** Grains (`04a` Steps 3-5): household / commodity / household×commodity. */
  final case class Grain(name: String, keys: Seq[String], needsProducts: Boolean)
  val household: Grain = Grain("household", Seq("household_key"), needsProducts = false)
  val commodity: Grain = Grain("commodity", Seq("commodity_desc"), needsProducts = true)
  val householdCommodity: Grain =
    Grain("household_commodity", Seq("household_key", "commodity_desc"), needsProducts = true)

  /** Fact with commodity attached (J1: broadcast the small dim). */
  def txWithCommodity(spark: SparkSession, sfDir: String): DataFrame =
    TransactionsAdj(spark, sfDir).join(
      broadcast(Retail.products(spark, sfDir).select("product_id", "commodity_desc")),
      Seq("product_id"), "inner")

  /** Driver-side scalar bounds (EP2 pattern): one tiny job, two literals. */
  def bounds(fact: DataFrame): (LocalDate, LocalDate) = {
    val row = fact.agg(min(col("day")), max(col("day"))).head()
    require(!row.isNullAt(0),
      "FeatureBuilder.bounds: fact has no rows — cannot derive feature windows")
    (row.getDate(0).toLocalDate, row.getDate(1).toLocalDate)
  }

  /** The full feature table for a grain: keys + (aggregates, ratios) × 4
    * windows, all DOUBLE, null-free.
    */
  def build(fact: DataFrame, grain: Grain,
      approxDistinct: Boolean = false): DataFrame = {
    val (_, cur) = bounds(fact)
    val wins = WindowSpec.windows(cur)
    val aggs = wins.flatMap(w => MetricDefs.aggsFor(w, cur, approxDistinct))
    val posts = wins.flatMap(MetricDefs.ratiosFor)

    // Pre-filter to the union of all windows: lets parquet skip row groups
    // outside [oldest window start, cur] before the shuffle.
    val oldest = wins.map(_.start).min(Ordering.by((d: LocalDate) => d.toEpochDay))
    val prefiltered = fact.filter(
      col("day").between(lit(java.sql.Date.valueOf(oldest)), lit(java.sql.Date.valueOf(cur))))

    val aggCols = aggs.map(a => a.col.as(a.name))
    val agged = prefiltered
      .groupBy(grain.keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)

    // `04a:556-558` (all features → DOUBLE) + `04a:595` (fillna 0.0) in one
    // projection.
    val cleaned = agged.select(
      grain.keys.map(col) ++
        aggs.map(a => coalesce(col(a.name).cast("double"), lit(0.0)).as(a.name)): _*)

    cleaned.select(
      (grain.keys.map(col) ++ aggs.map(a => col(a.name))
        ++ posts.map(p => p.col.as(p.name))): _*)
  }

  /** The output metric column names, in order (aggregates then ratios). */
  def metricNames: Seq[String] = {
    val epoch = LocalDate.ofEpochDay(0)
    val wins = WindowSpec.windows(epoch)
    wins.flatMap(w => MetricDefs.aggsFor(w, epoch)).map(_.name) ++
      wins.flatMap(MetricDefs.ratiosFor).map(_.name)
  }

  /** CTE chain computing `build` over relation `factRel`; every CTE is
    * prefixed with `p` so multiple chains can coexist in one oracle query.
    * Returns (cteFragment, finalRelName).
    */
  def cteChain(p: String, factRel: String, grain: Grain): (String, String) = {
    val keys = grain.keys.mkString(", ")
    val epoch = LocalDate.ofEpochDay(0) // Spark-side dates unused in SQL
    val wins = WindowSpec.windows(epoch)
    val maxOffset =
      wins.map(w => java.time.temporal.ChronoUnit.DAYS.between(w.start, epoch)).max
    val aggs = wins.flatMap(w => MetricDefs.aggsFor(w, epoch))
    val posts = wins.flatMap(MetricDefs.ratiosFor)
    val aggSelect = aggs.map(a => s"    ${a.sql} AS ${a.name}").mkString(",\n")
    val cleanSelect = aggs
      .map(a => s"    COALESCE(CAST(${a.name} AS DOUBLE), 0.0) AS ${a.name}")
      .mkString(",\n")
    val postSelect = posts.map(pd => s"    ${pd.sql} AS ${pd.name}").mkString(",\n")
    val frag =
      s"""${p}bounds AS (SELECT min(day) AS mn, max(day) AS cur FROM $factRel),
         |${p}pref AS (
         |  SELECT f.* FROM $factRel f CROSS JOIN ${p}bounds b
         |  WHERE f.day BETWEEN (b.cur - $maxOffset) AND b.cur),
         |${p}agged AS (
         |  SELECT $keys,
         |$aggSelect
         |  FROM ${p}pref CROSS JOIN ${p}bounds b
         |  GROUP BY $keys),
         |${p}cleaned AS (
         |  SELECT $keys,
         |$cleanSelect
         |  FROM ${p}agged),
         |${p}final AS (
         |  SELECT $keys, ${aggs.map(_.name).mkString(", ")},
         |$postSelect
         |  FROM ${p}cleaned)""".stripMargin
    (frag, s"${p}final")
  }

  /** DuckDB-oracle SQL for `build`, rendered from the SAME definitions.
    * `factCte` must define a relation named `fact_rel` with the silver
    * columns (+ commodity_desc when the grain needs it). The window-bound
    * SQL fragments reference the `bounds` CTE as alias `b`, cross-joined
    * into the aggregation (all references sit inside aggregate args, so no
    * extra GROUP BY keys are needed).
    */
  def buildSql(factCte: String, grain: Grain): String = {
    val (frag, fin) = cteChain("f_", "fact_rel", grain)
    s"WITH $factCte,\n$frag\nSELECT * FROM $fin"
  }
}
