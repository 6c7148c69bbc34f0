package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic repeat-factor resampling — the corpus-mixing primitive
  * that UP-samples as well as down: each source's rows are repeated by a
  * fractional factor (e.g. ×1.7 = every row twice with probability 0.7,
  * once otherwise), with the fractional part decided by the row key's
  * content hash, not an RNG. This is how temperature-style source
  * reweighting (factor ∝ (N/n_s)^(1−τ), computed driver-side from a
  * per-source count control table) is materialized into an epoch:
  * membership and multiplicity are a pure function of (key, factor), so
  * reruns, retries, and other engines reproduce the same epoch exactly.
  *
  * Factors are PARTS-PER-MILLION integers (1_700_000 = ×1.7): the
  * whole-copies part is `ppm div 1e6`, and one extra copy goes to rows
  * whose hash bucket falls below the fractional part —
  * `bucket · 1e6 < (ppm mod 1e6) · buckets`, all exact integer
  * arithmetic, no float thresholds to drift between engines (the DuckDB
  * oracle renders the identical expression). Sources absent from
  * `factorsPpm` are dropped, like [[MixSources.mix]].
  *
  * Scale shape: one broadcast join onto the (≤ #sources)-row factor
  * table, a per-row codegen'd copy count, and one `explode(sequence)`
  * whose blow-up is the factor itself — no shuffle, no state, output
  * size = Σ n_s · f_s by construction. `copy_idx` (1-based) makes the
  * replicas distinguishable downstream (e.g. as an epoch-local salt).
  *
  * (The reference has no resampling — single-corpus, `01:56-64`; this is
  * part of the training-data surface like [[MixSources]], which keeps
  * exact ratios by truncating; Resample instead scales every source by
  * its own factor.)
  */
object Resample {

  val FactorScale: Long = 1000000L

  def byFactors(df: DataFrame, sourceCol: String, keyCol: String,
      factorsPpm: Map[String, Long], buckets: Int = 1000000): DataFrame = {
    require(factorsPpm.nonEmpty, "Resample.byFactors: factorsPpm must be non-empty")
    require(factorsPpm.values.forall(_ >= 0),
      s"Resample.byFactors: factors must be >= 0, got $factorsPpm")
    require(!df.columns.contains("copy_idx"),
      "Resample.byFactors: input already has a copy_idx column")
    val spark = df.sparkSession
    import spark.implicits._
    val factors = factorsPpm.toSeq.sortBy(_._1).toDF("__src", "__ppm")
    // exact long arithmetic throughout: `div` for whole copies, the
    // fractional test cross-multiplied into integers
    val copies = expr(s"__ppm div $FactorScale") +
      when(HashSplit.bucket(col(keyCol), buckets) * lit(FactorScale) <
        pmod(col("__ppm"), lit(FactorScale)) * lit(buckets.toLong), 1L).otherwise(0L)
    df.join(broadcast(factors), col(sourceCol) === col("__src"))
      .withColumn("__copies", copies.cast("long"))
      // null keys hash to a null bucket → the fractional test is null →
      // otherwise(0): null-keyed rows get only their whole copies.
      // sequence(1, 0) would COUNT DOWN (default step −1); rows with zero
      // copies must be filtered out, not exploded.
      .filter(col("__copies") >= 1L)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("__copies"))))
      .select(df.columns.map(col).toSeq :+ col("copy_idx"): _*)
  }

  /** The same resample as a DuckDB query (oracle rendering): identical
    * integer arithmetic; replicas come from a STATIC series 1..maxCopies
    * joined on `copy_idx <= copies` (this DuckDB build does not accept
    * column parameters in lateral `generate_series`).
    */
  def byFactorsSql(table: String, keyExpr: String, sourceExpr: String,
      selectCols: Seq[String], factorsPpm: Map[String, Long],
      buckets: Int = 1000000): String = {
    def q(s: String) = s.replace("'", "''")
    // explicit BIGINT: DuckDB infers INT32 for small VALUES literals and
    // the cross-multiplied fractional test overflows INT32
    val rows = factorsPpm.toSeq.sortBy(_._1)
      .map { case (s, f) => s"('${q(s)}', CAST($f AS BIGINT))" }.mkString(", ")
    val cols = selectCols.map("c." + _).mkString(", ")
    val maxCopies = factorsPpm.values.max / FactorScale + 1L
    s"""WITH f AS (SELECT * FROM (VALUES $rows) v(src, ppm)
       |), c AS (
       |  SELECT d.*, (f.ppm // $FactorScale) +
       |    CASE WHEN ${HashSplit.bucketSql(s"d.$keyExpr", buckets)} * $FactorScale
       |              < (f.ppm % $FactorScale) * $buckets
       |      THEN 1 ELSE 0 END AS copies
       |  FROM $table d JOIN f ON d.$sourceExpr = f.src)
       |SELECT $cols, CAST(g.copy_idx AS BIGINT) AS copy_idx
       |FROM c JOIN generate_series(1, $maxCopies) AS g(copy_idx)
       |  ON g.copy_idx <= c.copies""".stripMargin
  }
}
