package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.ArrayOps

/** Similarity search over an embedding column (`embeddings.parquet`:
  * `vec_id BIGINT, embedding ARRAY<FLOAT>, label INT`).
  *
  * The kernel is graft.functions.DotProduct — a native codegen'd Catalyst
  * expression (the interpreted `zip_with`+`aggregate` chain is ~10×
  * slower on the all-pairs queries). Its summation order matches the
  * DuckDB oracle's `ORDER BY i` sum, so values are bit-identical; cosines
  * are additionally rounded to 9 decimals before ranking so a last-ulp
  * difference can neither change a rank nor the emitted value.
  *
  * Norms are computed ONCE per side and the pair kernel is a single dot —
  * at N² pairs that's the difference between N²·1 and N²·3 array scans.
  *
  * Brute force is the correctness baseline (exact recall). The IVF path
  * is the scale shape: assign vectors to coarse cells once, search only
  * the query's cell — both stages are parallel maps plus one small
  * shuffle on cell id; at 100 TB the cell assignment rides with the data
  * (written at ingest, pruned at scan).
  */
object Similarity {

  /** Deterministic Σ aᵢ·bᵢ (left fold over DOUBLE-cast elements). */
  def dot(a: Column, b: Column): Column = ArrayOps.dot_native(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Side projection: id, vector, precomputed norm. */
  private def side(df: DataFrame, idAs: String, vecAs: String, normAs: String) =
    df.select(col("vec_id").as(idAs), col("embedding").as(vecAs),
      norm(col("embedding")).as(normAs))

  private def pairCos(va: String, vb: String, na: String, nb: String): Column =
    round(dot(col(va), col(vb)) / (col(na) * col(nb)), 9)

  /** Exact top-k cosine neighbors for each query vector (self excluded).
    * Ranking key is (rounded cosine DESC, vec_id) — fully deterministic.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    ArrayOps.register(queries.sparkSession)
    val q = side(queries, "query_id", "qv", "nq")
    val c = side(corpus, "neighbor_id", "cv", "nc")
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        pairCos("qv", "cv", "nq", "nc").as("cos"))
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
    ArrayOps.register(queries.sparkSession)
    val centroids = corpus.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"),
        norm(col("embedding")).as("ncent"))
    def assign(df: DataFrame, idCol: String, vecCol: String, nCol: String): DataFrame = {
      val scored = df.crossJoin(broadcast(centroids))
        .select(col(idCol), col(vecCol), col(nCol), col("cell_id"),
          pairCos(vecCol, "centroid", nCol, "ncent").as("ccos"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("ccos").desc, col("cell_id"))
      scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .drop("r", "ccos")
    }
    val corpusCells = assign(side(corpus, "neighbor_id", "cv", "nc"),
      "neighbor_id", "cv", "nc")
    val queryCells = assign(side(queries, "query_id", "qv", "nq"),
      "query_id", "qv", "nq")
    val scored = queryCells.join(corpusCells, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        pairCos("qv", "cv", "nq", "nc").as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (dedup by semantic identity):
    * all pairs with cosine ≥ threshold. Exact; the LSH/IVF candidates
    * above are the scale path for the same predicate.
    */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    ArrayOps.register(vectors.sparkSession)
    val a = side(vectors, "vec_a", "va", "na")
    val b = side(vectors, "vec_b", "vb", "nb")
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        pairCos("va", "vb", "na", "nb").as("cos"))
      .filter(col("cos") >= threshold)
  }
}
