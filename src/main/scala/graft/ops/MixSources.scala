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
  * Scale shape: one count aggregate over the listed sources (map-side
  * partial, #sources groups) collected as a control table (≤ the number
  * of sources, not data-sized), then a second scan with the per-row
  * literal-baked predicate — filter pushdown eligible, no shuffle, no
  * state. Rows whose source is not listed in `parts` are dropped;
  * null keys hash to null and are dropped (same convention as
  * [[HashSplit.stratified]]).
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
    val sources = parts.keys.toSeq.sorted
    val in = df.filter(col(sourceCol).isin(sources: _*))
    // Control-table collect: one row per listed source, never data-sized.
    val counts: Map[String, Long] = in.groupBy(sourceCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val units: Long =
      sources.map(s => counts.getOrElse(s, 0L) / parts(s)).min
    val bucket = HashSplit.bucket(col(keyCol), buckets)
    val keep = sources.map { s =>
      val n = counts.getOrElse(s, 0L)
      val target = parts(s) * units
      col(sourceCol) === s && bucket * lit(n) < lit(target * buckets)
    }.reduce(_ || _)
    in.filter(keep)
  }

  /** The same mix as a DuckDB query (oracle rendering): recomputes the
    * per-source counts, the unit minimum, and the bucket predicate in
    * SQL with the identical integer arithmetic.
    */
  def mixSql(table: String, keyExpr: String, sourceExpr: String,
      selectCols: Seq[String], parts: Map[String, Int],
      buckets: Int = 1000000): String = {
    val partRows = parts.toSeq.sortBy(_._1)
      .map { case (s, w) => s"('$s', $w)" }.mkString(", ")
    val cols = selectCols.map("s." + _).mkString(", ")
    s"""WITH p AS (SELECT * FROM (VALUES $partRows) v(src, w)
       |), src AS (SELECT * FROM $table WHERE $sourceExpr IN (SELECT src FROM p)
       |), counts AS (SELECT $sourceExpr AS src, COUNT(*) AS n FROM src GROUP BY 1
       |), units AS (SELECT MIN(c.n // p.w) AS t FROM counts c JOIN p ON c.src = p.src)
       |SELECT $cols FROM src s
       |JOIN counts c ON s.$sourceExpr = c.src
       |JOIN p ON s.$sourceExpr = p.src
       |CROSS JOIN units u
       |WHERE ${HashSplit.bucketSql(s"s.$keyExpr", buckets)} * c.n
       |      < (p.w * u.t) * $buckets""".stripMargin
  }
}
