package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement — k items per
  * group with inclusion probability proportional to weight (the
  * Efraimidis–Spirakis priority scheme: draw u_i ~ U(0,1], rank by
  * u_i^(1/w_i), keep the top k). The standard use at corpus scale is
  * token-weighted subsampling ("sample 100k docs ∝ token count") where
  * seeded RNG is unusable: membership must be reproducible across reruns,
  * partitionings, and engines. Here u_i derives from the key's md5 (the
  * same content-hash determinism contract as [[HashSplit]]), so the
  * sample is a pure function of (keys, weights, k).
  *
  * Priorities use the monotone-equivalent ln(u)/w (avoids pow) and are
  * rounded to 9 decimals with the key as tiebreak — the
  * [[graft.queriesdef.Oracle]] convention for libm-boundary stability
  * (same as the lm_score ln pipeline). Ties after rounding resolve by
  * key, so both engines select identical members.
  *
  * Scale shape: the per-row priority is codegen'd column algebra (md5 +
  * arithmetic, no shuffle); the top-k per group is a ranked window whose
  * rank filter pushes into WindowGroupLimit — each map task keeps only
  * its local top k per group before the exchange, so the shuffle carries
  * O(k × groups × tasks) rows, never the corpus.
  */
object WeightedSample {

  private val TwoTo52 = 4503599627370496.0 // 16^13 = 2^52

  /** Deterministic u ∈ (0, 1]: the first 13 md5 hex digits (52 bits —
    * integer-exact in a double) + 1, over 2^52. The +1 keeps ln(u)
    * finite at the all-zero hash.
    */
  def uniform(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 13), 16, 10).cast("double")
      + 1.0) / lit(TwoTo52)

  /** E-S priority ln(u)/w, 9-decimal rounded (DESC order = weighted
    * top-k; higher weight pulls the negative priority toward 0).
    */
  def priority(key: Column, weight: Column): Column =
    round(log(uniform(key)) / weight.cast("double"), 9)

  /** The same arithmetic in DuckDB SQL (oracle rendering). */
  def prioritySql(keyExpr: String, weightExpr: String): String =
    s"""round(ln((CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 13))
       | AS BIGINT) + 1.0) / 4503599627370496.0)
       | / CAST($weightExpr AS DOUBLE), 9)""".stripMargin.replaceAll("\n", "")

  /** Top-`k` rows per group, weight-proportional, deterministic. Rows
    * with null, zero, or negative weight are dropped (they have no
    * defined inclusion probability). Output: input columns + `priority`
    * + `sample_rank` (1-based within group).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], keyCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"WeightedSample.topKPerGroup: k $k must be >= 1")
    require(groupCols.nonEmpty, "WeightedSample.topKPerGroup: need group cols")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("priority").desc, col(keyCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("priority", priority(col(keyCol), col(weightCol)))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }
}
