package graft.similarity

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Round9

/** Deterministic principal-component extraction over an embedding column
  * — the classic corpus diagnostic (is the embedding space collapsing to
  * one direction? what share of variance does the top component carry?)
  * computed so that BOTH stages are engine-exact:
  *
  *  1. **Covariance (the only data-sized pass)**: per-document dim-pair
  *     products, each quantized to DECIMAL(28,8) (deterministic HALF_UP
  *     on both engines), summed exactly in ONE map-side-combinable hash
  *     aggregate of d² control rows; C_ij = S_ij/n − (S_i/n)(S_j/n)
  *     closes with pinned association and quantizes to DECIMAL(18,9).
  *     The 8-dp product quantization keeps every decimal→double cast
  *     under 2⁵³ unscaled through ~10⁹ documents (single-rounding on
  *     both engines — nonzero-scale casts double-round in DuckDB past
  *     that).
  *  2. **Power iteration (control-sized closing algebra, the
  *     MarkovAttribution pattern)**: K steps of w = C·v with every
  *     product ROUND9'd before the exact sum, v renormalized to unit
  *     length and re-quantized to 9 dp each step — the output is the
  *     DEFINED statistic "K-step quantized power iteration from the
  *     uniform start", not a float approximation of the eigenvector,
  *     and the DuckDB oracle unrolls the identical K steps (hash
  *     equality proves it). Rayleigh λ and variance share close the
  *     same way.
  *
  * Scale shape: the pair explode is a per-row HOF projection (no join,
  * no shuffle beyond the d²-row aggregate); the iteration touches only
  * the collected d×d control matrix. d is the analysis dimension (a
  * PREFIX of the embedding — the Matryoshka convention used by
  * `truncated_recall`), bounded by the oracle-friendly d² control size.
  */
object EmbeddingPca {

  /** Top principal component of the first `d` embedding dims. Output:
    * one row per dim: (dim, loading, lambda, var_explained) — loading is
    * the unit eigenvector coordinate, λ the Rayleigh quotient, and
    * var_explained = λ / trace(C).
    */
  def topComponent(emb: DataFrame, d: Int = 16, steps: Int = 8): DataFrame = {
    require(d >= 2 && d <= 64, s"EmbeddingPca: d in [2,64], got $d")
    require(steps >= 1, s"EmbeddingPca: steps >= 1, got $steps")
    val spark = emb.sparkSession
    import spark.implicits._

    // pair products, quantized per row, one hash aggregate to d² rows
    val pairs = emb.select(expr(
      s"""inline(flatten(transform(sequence(0, ${d - 1}), i ->
         |  transform(sequence(0, ${d - 1}), j ->
         |    named_struct(
         |      'i', i, 'j', j,
         |      'p', CAST(CAST(element_at(embedding, i + 1) AS DOUBLE)
         |        * CAST(element_at(embedding, j + 1) AS DOUBLE)
         |        AS DECIMAL(28,8)))))))""".stripMargin))
    val sij = pairs.groupBy("i", "j")
      .agg(sum(col("p")).cast("decimal(28,8)").as("sij"))
    val si = emb.select(expr(
      s"""posexplode(transform(sequence(0, ${d - 1}), i ->
         |  CAST(CAST(element_at(embedding, i + 1) AS DOUBLE)
         |    AS DECIMAL(28,8))))""".stripMargin).as(Seq("i", "x")))
      .groupBy("i")
      // n rides along in the control-sized aggregate (each dim group sees
      // every corpus row) — no separate data-sized count() pass
      .agg(sum(col("x")).cast("decimal(28,8)").as("s"),
        count(lit(1)).as("n"))

    // C_ij, pinned association, ROUND9 → the iteration's exact matrix
    val cov = sij
      .join(broadcast(si.select(col("i"), col("s").as("s_i"),
        col("n").cast("double").as("n"))), Seq("i"))
      .join(broadcast(si.select(col("i").as("j"), col("s").as("s_j"))),
        Seq("j"))
      .select(col("i"), col("j"),
        round(col("sij").cast("double") / col("n")
          - (col("s_i").cast("double") / col("n"))
            * (col("s_j").cast("double") / col("n")), 9)
          .as("c"))
      .collect().map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        Round9.round9d(r.getAs[Double]("c"))).toMap
    // empty corpus → no covariance → empty result, not a map-lookup crash
    if (cov.isEmpty)
      return Seq.empty[(Long, Double, Double, Double)]
        .toDF("dim", "loading", "lambda", "var_explained")

    // K quantized power-iteration steps from the uniform start
    def r9(x: JBigDecimal): JBigDecimal =
      x.setScale(9, java.math.RoundingMode.HALF_UP)
    val v0 = JBigDecimal.ONE.divide(new JBigDecimal(d), 9,
      java.math.RoundingMode.HALF_UP)
    var v: IndexedSeq[JBigDecimal] = IndexedSeq.fill(d)(v0)
    for (_ <- 1 to steps) {
      val w = (0 until d).map { i =>
        (0 until d).foldLeft(JBigDecimal.ZERO) { (acc, j) =>
          acc.add(r9(cov((i, j)).multiply(v(j))))
        }
      }
      val ssq = w.foldLeft(JBigDecimal.ZERO) { (acc, wi) =>
        acc.add(r9(wi.multiply(wi)))
      }
      val nrm = math.sqrt(ssq.doubleValue())
      // C·v = 0 (zero covariance matrix, e.g. a constant or zero-padded
      // prefix): every vector is a 0-eigenvector — keep the current v
      // rather than normalizing 0/0 into NaN (Round9 throws on NaN)
      if (nrm != 0.0)
        v = w.map(wi => Round9.round9d(wi.doubleValue() / nrm))
    }
    // Rayleigh λ = Σ_i round9(v_i · (C·v)_i); trace = Σ C_ii (exact)
    val cv = (0 until d).map { i =>
      (0 until d).foldLeft(JBigDecimal.ZERO) { (acc, j) =>
        acc.add(r9(cov((i, j)).multiply(v(j))))
      }
    }
    val lambda = (0 until d).foldLeft(JBigDecimal.ZERO) { (acc, i) =>
      acc.add(r9(v(i).multiply(cv(i))))
    }
    val trace = (0 until d).foldLeft(JBigDecimal.ZERO) { (acc, i) =>
      acc.add(cov((i, i)))
    }
    // trace = 0 (zero-variance prefix) → NULL share, not 0/0 = NaN
    val varExp: Option[Double] =
      if (trace.signum == 0) None
      else Some(lambda.doubleValue() / trace.doubleValue())
    (0 until d).map(i =>
      (i.toLong, v(i).doubleValue(), lambda.doubleValue(), varExp))
      .toDF("dim", "loading", "lambda", "var_explained")
  }
}
