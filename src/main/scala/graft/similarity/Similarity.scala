package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`embeddings.parquet`:
  * `vec_id BIGINT, embedding ARRAY<FLOAT>, label INT`).
  *
  * Dot products are pure column algebra: `zip_with` + `aggregate` (a
  * sequential left fold — deterministic summation order, unlike a SQL SUM
  * over exploded elements) with elements cast to DOUBLE first so the
  * arithmetic is bit-identical to the DuckDB oracle. Cosines are rounded
  * to 9 decimals before ranking so an engine's last-ulp difference can
  * neither change a rank nor the emitted value.
  *
  * Brute force is the correctness baseline (O(|Q|·N) — fine for small
  * query sets, exact recall). The IVF path (`ivfTopK`) is the scale
  * shape: assign vectors to coarse centroids once (N·C dots), then search
  * only the query's probe cells — at 1000 executors both stages are
  * embarrassing parallel maps plus one small shuffle on cell id.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a deterministic left fold over DOUBLE elements. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector (self excluded).
    * Ranking key is (rounded cosine DESC, vec_id) — fully deterministic.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 9).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style ANN: coarse-quantize the corpus against `centroids` (the
    * first `nCells` vectors, a deterministic stand-in for k-means), search
    * only the query's cell. Approximate (recall < 1 near cell borders) —
    * the scale path, verified by unit test against brute force recall.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nCells: Int): DataFrame = {
    val centroids = corpus.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"))
    def assign(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
      val scored = df.crossJoin(broadcast(centroids))
        .select(col(idCol), col(vecCol),
          col("cell_id"), round(cosine(col(vecCol), col("centroid")), 9).as("ccos"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("ccos").desc, col("cell_id"))
      scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .drop("r", "ccos")
    }
    val corpusCells = assign(
      corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
      "neighbor_id", "cv")
    val queryCells = assign(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      "query_id", "qv")
    val scored = queryCells.join(corpusCells, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 9).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (dedup by semantic identity):
    * all pairs with cosine ≥ threshold. Exact; the LSH/IVF candidates
    * above are the scale path for the same predicate.
    */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
    val b = vectors.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("va"), col("vb")), 9).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
