package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Affine int8 quantization of an embedding column — the storage-scale
  * path for a 100 TB vector corpus: per-dimension global [min, max] maps
  * each float32 to an 8-bit level (4× smaller, and SIMD-friendly for
  * downstream scoring), with the reconstruction-error audit a compression
  * rollout needs.
  *
  * Scale shape: the stats pass explodes to (dim, value) and hash-
  * aggregates per dimension — d distinct keys, map-side combinable, one
  * tiny shuffle; the result (d rows) collapses to ONE broadcast row of
  * aligned min/scale arrays. The quantize pass is then a pure per-row
  * `transform` HOF — no shuffle, no state, embarrassingly parallel, the
  * shape that rides along any later scan. A constant dimension
  * (max = min) quantizes to level 0 with scale 0 (guarded: ANSI division
  * would abort on 0/0).
  */
object Quantize {

  /** Per-dimension stats: `(pos, mn, mx)`, one row per dimension. */
  def dimStats(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))

  /** Quantization audit per vector: `vec_id, n_dims, q_min, q_max,
    * q_sum` (order-independent integer checksum of the quantized codes)
    * and `max_abs_err` (worst per-dimension reconstruction error).
    * `levels` = number of quantization levels − 1 (255 for int8).
    */
  def auditInt8(df: DataFrame, vecCol: String = "embedding",
      levels: Int = 255): DataFrame = {
    require(levels >= 1, s"auditInt8: levels must be >= 1, got $levels")
    val statsRow = dimStats(df, vecCol)
      .agg(
        sort_array(collect_list(struct(col("pos"), col("mn")))).as("mns"),
        sort_array(collect_list(struct(col("pos"), col("mx")))).as("mxs"))
      .select(
        expr("transform(mns, s -> s.mn)").as("mns"),
        expr("transform(mxs, s -> s.mx)").as("mxs"))
    df.crossJoin(broadcast(statsRow))
      .select(col("vec_id"), col(vecCol).as("v"), col("mns"), col("mxs"))
      .withColumn("q", expr(
        s"""transform(v, (x, i) ->
           |  CASE WHEN mxs[i] = mns[i] THEN 0L
           |  ELSE CAST(round((CAST(x AS DOUBLE) - mns[i])
           |    / ((mxs[i] - mns[i]) / $levels.0)) AS LONG) END)""".stripMargin))
      .withColumn("err", expr(
        s"""transform(v, (x, i) ->
           |  CASE WHEN mxs[i] = mns[i] THEN 0.0D
           |  ELSE abs(CAST(x AS DOUBLE) - (mns[i]
           |    + CAST(round((CAST(x AS DOUBLE) - mns[i])
           |        / ((mxs[i] - mns[i]) / $levels.0)) AS DOUBLE)
           |      * ((mxs[i] - mns[i]) / $levels.0))) END)""".stripMargin))
      .select(
        col("vec_id"),
        size(col("v")).cast("long").as("n_dims"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        expr("aggregate(q, 0L, (acc, x) -> acc + x)").as("q_sum"),
        round(array_max(col("err")), 9).as("max_abs_err"))
  }
}
