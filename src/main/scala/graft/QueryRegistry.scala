package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry binding SURVEY.md §2 operator ids → (Spark query,
  * DuckDB oracle). Split out of SparkEntry so each module contributes its
  * own slice (`Registrable`).
  */
object QueryRegistry {

  /** A named query with an optional DuckDB oracle. */
  final case class Entry(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def modules: Seq[Seq[Entry]] = Seq(
    queriesdef.CoreQueries.entries,
    queriesdef.FeatureQueries.entries,
    queriesdef.TrainScoreQueries.entries,
    queriesdef.EvalQueries.entries,
    queriesdef.AnalyticsQueries.entries,
    queriesdef.CausalQueries.entries,
    queriesdef.TextQueries.entries,
    queriesdef.SimilarityQueries.entries,
    queriesdef.EventQueries.entries)

  lazy val all: Seq[Entry] = {
    val es = modules.flatten
    val dup = es.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    es
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(e => e.name -> e.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
