package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus mixing: downsample each source so the surviving
  * per-source counts sit in a caller-given integer ratio (the "data
  * mixture" step of a training pipeline — e.g. web:books:code = 7:2:1 —
  * run before packing/tokenization), keeping as much data as the binding
  * source allows.
  *
  * Membership is a pure function of the record key via the same
  * md5-bucket arithmetic as [[HashSplit]]: no seeded RNG, no row-order or
  * partition-count dependence, and a document keeps its in/out status
  * across incremental reruns. All boundary comparisons are exact integer
  * arithmetic (`bucket * n_s < c_s * buckets`), so the same predicate
  * renders to DuckDB SQL and the `mix_sources` oracle verifies
  * membership engine-exact.
  *
  * Targets: with parts `w_s` and observed counts `n_s`, the mix keeps
  * `c_s = w_s * T` of each source where `T = min_s floor(n_s / w_s)` —
  * the largest whole number of "mixture units" every source can supply,
  * so the binding (scarcest-relative-to-weight) source survives ~whole
  * and nothing is oversampled. Realized counts are hash-uniform
  * approximations of `c_s` (exact proportions would need a global sort;
  * a content-hash threshold is the scale-correct trade).
  *
  * Scale shape — and fully lazy (constructing the DataFrame runs no
  * jobs): one count aggregate over the listed sources (map-side partial,
  * #sources groups) left-joined onto the broadcast parts table (an
  * absent source keeps a 0 count and forces `T = 0`), a 1-row global
  * min for `T`, and two broadcast joins back onto the data — per-row
  * work thereafter, no extra shuffle. Rows whose source is not listed
  * in `parts` are dropped; null keys hash to null and are dropped (same
  * convention as [[HashSplit.stratified]]).
  *
  * (The reference has no mixing step — its corpus is single-source; this
  * is part of the training-data surface beyond the reference, like
  * [[HashSplit]] and [[graft.text.Curation]].)
  */
object MixSources {

  /** Keep a deterministic subset of `df` so that per-source survivor
    * counts are in the `parts` ratio. A source listed in `parts` but
    * absent from the data makes the mixture unsatisfiable: `T = 0` and
    * the result is empty (fail-empty is loud in any downstream count,
    * and the right answer for "mix requires a source I don't have").
    */
  def mix(df: DataFrame, keyCol: String, sourceCol: String,
      parts: Map[String, Int], buckets: Int = 1000000): DataFrame = {
    require(parts.nonEmpty, "MixSources.mix: parts must be non-empty")
    require(parts.values.forall(_ > 0),
      s"MixSources.mix: mixture parts must be positive, got $parts")
    val spark = df.sparkSession
    import spark.implicits._
    val sources = parts.keys.toSeq.sorted
    val in = df.filter(col(sourceCol).isin(sources: _*))
    val partsDf = parts.toSeq.sortBy(_._1).toDF("__src", "__w")
    val counts = in.groupBy(col(sourceCol).as("__csrc"))
      .agg(count(lit(1)).as("__cn"))
    // absent source → no counts row → COALESCE to 0 → T = 0 (fail-empty)
    val stats = broadcast(partsDf)
      .join(counts, col("__src") === col("__csrc"), "left_outer")
      .select(col("__src"), col("__w"),
        coalesce(col("__cn"), lit(0L)).as("__n"))
    val units = stats.agg(min(expr("__n div __w")).as("__t"))
    in.join(broadcast(stats), col(sourceCol) === col("__src"))
      .crossJoin(broadcast(units))
      .filter(HashSplit.bucket(col(keyCol), buckets) * col("__n") <
        col("__w") * col("__t") * lit(buckets.toLong))
      .select(in.columns.map(col).toSeq: _*)
  }

  /** The same mix as a DuckDB query (oracle rendering): recomputes the
    * per-source counts, the unit minimum (absent sources included, as a
    * 0 count), and the bucket predicate in SQL with the identical
    * integer arithmetic.
    */
  def mixSql(table: String, keyExpr: String, sourceExpr: String,
      selectCols: Seq[String], parts: Map[String, Int],
      buckets: Int = 1000000): String = {
    def q(s: String) = s.replace("'", "''")
    val partRows = parts.toSeq.sortBy(_._1)
      .map { case (s, w) => s"('${q(s)}', $w)" }.mkString(", ")
    val cols = selectCols.map("s." + _).mkString(", ")
    s"""WITH p AS (SELECT * FROM (VALUES $partRows) v(src, w)
       |), src AS (SELECT * FROM $table WHERE $sourceExpr IN (SELECT src FROM p)
       |), counts AS (SELECT $sourceExpr AS csrc, COUNT(*) AS cn FROM src GROUP BY 1
       |), stats AS (
       |  SELECT p.src, p.w, COALESCE(c.cn, 0) AS n
       |  FROM p LEFT JOIN counts c ON p.src = c.csrc
       |), units AS (SELECT MIN(n // w) AS t FROM stats)
       |SELECT $cols FROM src s
       |JOIN stats st ON s.$sourceExpr = st.src
       |CROSS JOIN units u
       |WHERE ${HashSplit.bucketSql(s"s.$keyExpr", buckets)} * st.n
       |      < (st.w * u.t) * $buckets""".stripMargin
  }
}
