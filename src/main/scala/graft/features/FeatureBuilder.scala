package graft.features

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Retail
import graft.silver.TransactionsAdj
import MetricDefs.AggKind

/** Re-expression of the reference's `get_features` (`04a:116-561`) as a
  * declarative, shuffle-minimal feature builder.
  *
  * Reference shape: per window → filter → groupBy → ~100 `withColumn`s →
  * suffix-rename → 4-way left-join chain onto a spine → fillna.
  * Engine shape: grouped aggregates whose aggregate list carries the
  * window condition inside every aggregate (all 4 windows at once), then
  * one cleanup projection (cast DOUBLE + fill 0.0, `04a:556-558`/`04a:595`
  * semantics) and one ratio projection.
  *
  * Exact distinct counts (the ~48 `COUNT(DISTINCT CASE WHEN …)` aggregates)
  * are NOT computed in that same pass: Catalyst's
  * `RewriteDistinctAggregates` would Expand the input once per distinct
  * group (~13×) through the shuffle — the SURVEY §4 hotspot, and a
  * scale-killer at 100 TB. Instead the builder splits them per distinct
  * ENTITY (day / basket_id / product_id): for each entity it
  * pre-aggregates boolean "seen under condition" indicators on
  * `(grain keys, entity)` — a plain, map-side-combinable aggregation over
  * pruned columns — then sums the indicators per grain key and joins the
  * three small per-key results back onto the plain aggregates. Row
  * expansion: none. Shuffle volume: one pruned pass per entity with
  * map-side dedup, instead of a 13×-expanded full pass.
  *
  * On the bucketed silver table (SilverStore: 32 buckets on
  * `household_key`) every one of these aggregations and joins for the
  * household and household×commodity grains satisfies its clustering from
  * the bucket partitioning (`Hash(household_key)` ⊆ every grouping set),
  * so the whole feature build runs with ZERO exchanges — pinned by
  * PlanSpec.
  *
  * Rows with null grain keys are excluded by the pre-filter (engine and
  * oracle alike) — the grains are defined over non-null keys, matching
  * the reference, whose spine join-back on the grouping keys
  * (`04a:548-552`) never matches null keys either.
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
    * windows, all DOUBLE, null-free. Pass `knownBounds` when the caller
    * already ran [[bounds]] on this fact (training_set builds three
    * grains over two facts — one bounds job each, not one per grain).
    */
  def build(fact: DataFrame, grain: Grain,
      approxDistinct: Boolean = false,
      knownBounds: Option[(LocalDate, LocalDate)] = None,
      referenceExact: Boolean = false): DataFrame = {
    val (_, cur) = knownBounds.getOrElse(bounds(fact))
    val wins = WindowSpec.windows(cur)
    val aggs = wins.flatMap(w =>
      MetricDefs.aggsFor(w, approxDistinct, referenceExact, precomputed = true))
    val posts = wins.flatMap(MetricDefs.ratiosFor)

    // Pre-filter to the union of all windows: lets parquet skip row groups
    // outside [oldest window start, cur] before any aggregation. Null
    // grain keys are excluded EXPLICITLY (and identically in the oracle's
    // pref CTE): the grains are defined over non-null keys — reference
    // behavior, since its spine join-back on the grouping keys
    // (`04a:548-552`) never matches null keys either — and making it a
    // filter keeps the exact split-distinct path (whose joins use
    // null-rejecting equality) consistent with the approx single-pass.
    val oldest = wins.map(_.start).min(Ordering.by((d: LocalDate) => d.toEpochDay))
    val keyCols = grain.keys.map(col)
    // Hoist every expression the ~430 aggregates share into ONE physical
    // column each (the `precomputed = true` contract of
    // MetricDefs.aggsFor): 4 window-membership booleans, 4 flag
    // positivity booleans, 6 decimal money copies. The aggregate update
    // loop then reads a column instead of re-evaluating the expression —
    // the DOUBLE→DECIMAL cast in particular allocates per evaluation and
    // previously ran at 24 cast sites per row (4 windows × 6 metrics).
    val pre =
      WindowSpec.windows(cur).map(w =>
        col("day").between(
          lit(java.sql.Date.valueOf(w.start)), lit(java.sql.Date.valueOf(w.end)))
          .as(MetricDefs.winFlagCol(w))) ++
      MetricDefs.flagMetrics.map(m =>
        (col(m) > 0.0).as(MetricDefs.posFlagCol(m))) ++
      MetricDefs.moneyMetrics.map(m =>
        col(m).cast("decimal(18,4)").as(MetricDefs.decCol(m)))
    val prefiltered = fact.filter(
      col("day").between(lit(java.sql.Date.valueOf(oldest)), lit(java.sql.Date.valueOf(cur))) &&
        grain.keys.map(col(_).isNotNull).reduce(_ && _))
      .select(fact.columns.map(col).toSeq ++ pre: _*)

    // `04a:556-558` (all features → DOUBLE) + `04a:595` (fillna 0.0),
    // fused into each aggregation's RESULT expressions rather than a
    // post-join cleanup projection. Values are identical (the same
    // coalesce(cast(agg AS DOUBLE), 0.0) tree, evaluated per aggregate
    // output row instead of per joined row) — but the plan shape matters:
    // a ~430-column cleanup Project stacked on the entity-count join chain
    // put >64 KB of generated code into ONE whole-stage-codegen method,
    // which janino REJECTS — and because expression ids are fresh per
    // execution, the doomed compile re-ran on every execution (~1s of
    // driver time) before falling back to interpreted evaluation of the
    // widest projection in the plan. Fused into the aggregates, each
    // HashAggregate emits clean doubles from its own (method-splittable)
    // span and the join chain carries only pass-through columns.
    def cleanDouble(c: Column): Column = coalesce(c.cast("double"), lit(0.0))
    val agged =
      if (approxDistinct) {
        // HLL sketches are ordinary algebraic aggregates — one pass, no
        // Expand, nothing to split.
        val aggCols = aggs.map(a => cleanDouble(a.col).as(a.name))
        prefiltered.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
      } else if (!fact.sparkSession.conf
          .getOption("spark.graft.features.dayFusion").forall(_.toBoolean)) {
        // flag-off path (the pre-r10 single-pass shape, kept for A/B and
        // for fixtures where (keys, day) does not compress below rows)
        val plain = aggs.filter(_.kind == AggKind.Plain)
        val dist = aggs.flatMap(a => a.kind match {
          case d: AggKind.DistinctOf => Some((a, d))
          case AggKind.Plain => None
        })
        val plainCols = plain.map(a => cleanDouble(a.col).as(a.name))
        val plainDf = prefiltered.groupBy(keyCols: _*)
          .agg(plainCols.head, plainCols.tail: _*)
        val entities = dist.map(_._2.entity).distinct
        val entityCounts = entities.map { e =>
          val forE = dist.filter(_._2.entity == e)
          val indicators = forE.map { case (a, d) =>
            max(when(d.cond && col(e).isNotNull, lit(1))).as(s"seen__${a.name}")
          }
          val pre = prefiltered.groupBy((keyCols :+ col(e)): _*)
            .agg(indicators.head, indicators.tail: _*)
          val counts = forE.map { case (a, _) =>
            cleanDouble(sum(col(s"seen__${a.name}"))).as(a.name)
          }
          pre.groupBy(keyCols: _*).agg(counts.head, counts.tail: _*)
        }
        entityCounts.foldLeft(plainDf)((acc, df) => acc.join(df, grain.keys, "inner"))
      } else {
        val plain = aggs.filter(_.kind == AggKind.Plain)
        val dist = aggs.flatMap(a => a.kind match {
          case d: AggKind.DistinctOf => Some((a, d))
          case AggKind.Plain => None
        })
        // Day fusion (MetricDefs.dayPartials scaladoc): every plain
        // aggregate AND the day-entity distincts reduce exactly over a
        // (keys, day) pre-aggregate, so the widest pass — ~88 conditional
        // aggregates — runs over keys × horizon-days rows instead of fact
        // rows, and the fact itself is scanned once less (the former
        // standalone plain pass folds into the day pass). Stage 1 is ~21
        // narrow, window-independent, map-combinable partials.
        val partials = MetricDefs.dayPartials(referenceExact)
        val dayKeyed = prefiltered
          .groupBy((keyCols :+ col("day")): _*)
          .agg(partials.head, partials.tail: _*)
        val dayFlags = WindowSpec.windows(cur).map(w =>
          col("day").between(
            lit(java.sql.Date.valueOf(w.start)), lit(java.sql.Date.valueOf(w.end)))
            .as(MetricDefs.winFlagCol(w)))
        val dayFrame = dayKeyed.select(
          dayKeyed.columns.map(col).toSeq ++ dayFlags: _*)
        val fused = wins.flatMap(w =>
          MetricDefs.fusedDayAggs(w, referenceExact))
        // construction-time guard: the fused set must cover exactly the
        // plain aggregates plus the day-entity distincts of aggsFor —
        // a metric added to one renderer but not the other fails fast
        // here, not as a silent column drift
        require(fused.map(_.name).toSet ==
          (plain.map(_.name) ++
            dist.filter(_._2.entity == "day").map(_._1.name)).toSet,
          "FeatureBuilder: fusedDayAggs out of sync with aggsFor")
        val fusedCols = fused.map(a => cleanDouble(a.col).as(a.name))
        val plainDf = dayFrame.groupBy(keyCols: _*)
          .agg(fusedCols.head, fusedCols.tail: _*)

        val entities = dist.map(_._2.entity).distinct.filter(_ != "day")
        val entityCounts = entities.map { e =>
          val forE = dist.filter(_._2.entity == e)
          // stage 1: per (keys, entity) — has any row satisfied each
          // window/flag condition? Null entities are excluded, matching
          // COUNT(DISTINCT CASE …)'s null-skipping.
          val indicators = forE.map { case (a, d) =>
            max(when(d.cond && col(e).isNotNull, lit(1))).as(s"seen__${a.name}")
          }
          val pre = prefiltered.groupBy((keyCols :+ col(e)): _*)
            .agg(indicators.head, indicators.tail: _*)
          // stage 2: per keys — count the entities seen under each
          // condition (sum of 0/1 indicators ≡ exact distinct count).
          val counts = forE.map { case (a, _) =>
            cleanDouble(sum(col(s"seen__${a.name}"))).as(a.name)
          }
          pre.groupBy(keyCols: _*).agg(counts.head, counts.tail: _*)
        }
        // Same fact, same grouping → identical key sets on every side;
        // the using-join resolves by name, so self-lineage is fine.
        entityCounts.foldLeft(plainDf)((acc, df) => acc.join(df, grain.keys, "inner"))
      }

    // canonical metric order after the joins (pass-through projection; the
    // DOUBLE cast + 0.0 fill happened inside each aggregate above)
    val cleaned = agged.select(keyCols ++ aggs.map(a => col(a.name)): _*)

    cleaned.select(
      (keyCols ++ aggs.map(a => col(a.name))
        ++ posts.map(p => p.col.as(p.name))): _*)
  }

  /** The output metric column names, in order (aggregates then ratios). */
  def metricNames: Seq[String] = {
    val epoch = LocalDate.ofEpochDay(0)
    val wins = WindowSpec.windows(epoch)
    wins.flatMap(w => MetricDefs.aggsFor(w)).map(_.name) ++
      wins.flatMap(MetricDefs.ratiosFor).map(_.name)
  }

  /** CTE chain computing `build` over relation `factRel`; every CTE is
    * prefixed with `p` so multiple chains can coexist in one oracle query.
    * Returns (cteFragment, finalRelName).
    */
  def cteChain(p: String, factRel: String, grain: Grain,
      referenceExact: Boolean = false): (String, String) = {
    val keys = grain.keys.mkString(", ")
    val epoch = LocalDate.ofEpochDay(0) // Spark-side dates unused in SQL
    val wins = WindowSpec.windows(epoch)
    val maxOffset =
      wins.map(w => java.time.temporal.ChronoUnit.DAYS.between(w.start, epoch)).max
    val aggs = wins.flatMap(w => MetricDefs.aggsFor(w, referenceExact = referenceExact))
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
         |  WHERE f.day BETWEEN (b.cur - $maxOffset) AND b.cur
         |    AND ${grain.keys.map(k => s"f.$k IS NOT NULL").mkString(" AND ")}),
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
  def buildSql(factCte: String, grain: Grain,
      referenceExact: Boolean = false): String = {
    val (frag, fin) = cteChain("f_", "fact_rel", grain, referenceExact)
    s"WITH $factCte,\n$frag\nSELECT * FROM $fin"
  }
}
