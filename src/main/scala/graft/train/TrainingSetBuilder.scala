package graft.train

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-key point-in-time feature lookup (SURVEY.md J5, the reference's
  * `FeatureLookup`/`create_training_set`, `04b:195-217`).
  *
  * Each feature table joins the spine LEFT OUTER on its PK
  * `(grainKeys…, day)` — exact-match point-in-time by design
  * (`04a:599`: the as-of variant was "very slow", so snapshots carry their
  * day in the PK). Metric columns get a per-table prefix
  * (`household__`/`commodity__`/`household_commodity__`, `04b:201-215`)
  * and excluded columns are dropped before the join, implemented as a
  * single projection (`withColumnsRenamed` + select), never per-column
  * plan mutations.
  *
  * Scale: the spine is (households × ~10 commodities) — far smaller than
  * the fact table. The household/commodity feature tables are ≤ |spine| by
  * construction, so Catalyst broadcast-joins the small sides; the
  * household×commodity table shares the spine's key distribution, so one
  * hash-partition on (household_key, commodity_desc) serves both that join
  * and downstream per-commodity filters.
  */
object TrainingSetBuilder {

  final case class Lookup(
      features: DataFrame,
      grainKeys: Seq[String],
      prefix: String,
      exclude: Seq[String] = Nil)

  def lookup(spine: DataFrame, lk: Lookup, joinDay: Boolean = true): DataFrame = {
    val joinKeys = if (joinDay) lk.grainKeys :+ "day" else lk.grainKeys
    val metricCols = lk.features.columns.toSeq
      .filterNot(joinKeys.contains).filterNot(lk.exclude.contains)
    val projected = lk.features.select(
      joinKeys.map(col) ++ metricCols.map(c => col(c).as(s"${lk.prefix}$c")): _*)
    spine.join(projected, joinKeys, "left_outer")
  }

  /** Chain every lookup then fill absent features with 0.0 (`04a:595`
    * semantics carried into the training set).
    */
  def build(spine: DataFrame, lookups: Seq[Lookup], joinDay: Boolean = true): DataFrame = {
    val joined = lookups.foldLeft(spine)((df, lk) => lookup(df, lk, joinDay))
    val featureCols = joined.columns.filterNot(spine.columns.contains)
    joined.na.fill(0.0, featureCols)
  }
}
