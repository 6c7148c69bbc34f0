package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table content digests — the reproducibility audit
  * the reference's verification counts approximate with row counts
  * alone (`04a:639-643`, SURVEY.md A9; counts miss value-level drift,
  * digests don't), and the one
  * a 100 TB pipeline runs after every rewrite (compaction, cluster
  * migration, engine upgrade): did the TABLE change, independent of row
  * order, file layout, and partitioning? Row-level: a 60-bit md5-derived
  * hash of the canonical string rendering; table-level: the exact
  * decimal SUM of row hashes mod 2⁶¹ — addition commutes, so any
  * row order / any partitioning yields the same digest, and the mod
  * runs on an EXACT 38-digit decimal (never a silently-wrapping int64
  * sum, which would be accumulation-order-visible in ANSI mode and
  * engine-specific in overflow behavior). The md5 arithmetic is the
  * [[HashSplit]] family's, so digests render to DuckDB and the
  * `content_digest` entry hash-proves the audit itself.
  *
  * Canonicalization contract: feed INTEGER/DATE/STRING columns only —
  * quantize doubles first (e.g. `round(x·10⁴) AS BIGINT`); float-to-
  * string rendering is not engine-portable. `concat_ws` skips nulls in
  * both engines, so a null and a missing column render identically —
  * acceptable for digesting (a change is still a change), not for
  * parsing back.
  */
object Digest {

  /** 60-bit row hash of the canonical '|'-joined rendering. */
  def rowHash(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", cols: _*)), 1, 15), 16, 10)
      .cast("long")

  private val Mod = 2305843009213693952L // 2^61

  /** One-row digest frame: (relation, n_rows, digest). */
  def tableDigest(df: DataFrame, relation: String,
      cols: Seq[Column]): DataFrame =
    df.select(rowHash(cols).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__h").cast("decimal(38,0)")).as("__s"))
      .select(lit(relation).as("relation"), col("n_rows"),
        coalesce(expr(s"CAST(__s % ${Mod}L AS BIGINT)"), lit(0L))
          .as("digest"))
}
