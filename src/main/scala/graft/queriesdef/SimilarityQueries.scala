package graft.queriesdef

import org.apache.spark.sql.functions._
import graft.QueryRegistry.Entry
import graft.core.Catalog
import graft.similarity.Similarity

/** Similarity-search queries over `embeddings` (vec_id, embedding
  * ARRAY<FLOAT>, label). The DuckDB dot product is an ORDERED correlated
  * sum over element indices — the same left-to-right accumulation as
  * Spark's `aggregate` fold — and cosines are rounded to 9 decimals on
  * both sides before ranking/filtering.
  */
object SimilarityQueries {

  /** Ordered Σ a[i]·b[i] over the first `dims` dims (DOUBLE-cast). */
  private def dotSql(a: String, b: String, dims: Int = 64): String =
    s"""(SELECT SUM(CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE) ORDER BY i)
       | FROM generate_series(1, $dims) t(i))""".stripMargin.replace("\n", " ")

  /** Same zero-vector convention as Similarity.cosine: cos(0, ·) = 0.0. */
  private def cosSql(a: String, b: String, dims: Int = 64): String = {
    val den = s"(sqrt(${dotSql(a, a, dims)}) * sqrt(${dotSql(b, b, dims)}))"
    s"round(CASE WHEN $den <> 0.0 THEN ${dotSql(a, b, dims)} / $den ELSE 0.0 END, 9)"
  }

  def entries: Seq[Entry] = Seq(

    // Per-label centroid + per-coordinate variance, long form (one row
    // per label × dimension): posexplode → one hash aggregate, sums
    // through DECIMAL(27,6) so the result is row-order independent on
    // both engines.
    Entry(
      "embedding_centroids",
      (s, dir) => Similarity.labelCentroids(Catalog.table(s, dir, "embeddings")),
      Some("""WITH x AS (
        |  SELECT e.label, g.i - 1 AS pos, CAST(e.embedding[g.i] AS DOUBLE) AS v
        |  FROM embeddings e JOIN generate_series(1, 64) AS g(i)
        |    ON g.i <= len(e.embedding)),
        |a AS (
        |  SELECT label, pos, COUNT(*) AS n_vectors,
        |    SUM(CAST(v AS DECIMAL(27,6))) AS s,
        |    SUM(CAST(v * v AS DECIMAL(27,6))) AS s2
        |  FROM x GROUP BY label, pos)
        |SELECT label, pos, n_vectors,
        |  CAST(s AS DOUBLE) / n_vectors AS centroid,
        |  GREATEST(CAST(s2 AS DOUBLE) / n_vectors -
        |    (CAST(s AS DOUBLE) / n_vectors) * (CAST(s AS DOUBLE) / n_vectors),
        |    0.0) AS variance
        |FROM a""".stripMargin)),

    // Per-vector norms — the embedding hygiene check.
    Entry(
      "embedding_norms",
      (s, dir) => {
        graft.functions.ArrayOps.register(s)
        Catalog.table(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            round(Similarity.norm(col("embedding")), 9).as("norm"))
      },
      Some(s"""SELECT e.vec_id, e.label,
        |  round(sqrt(${dotSql("e", "e")}), 9) AS norm
        |FROM embeddings e""".stripMargin)),

    // Brute-force exact cosine top-k (k=5) for query vectors vec_id<20.
    Entry(
      "ann_bruteforce",
      (s, dir) => {
        val emb = Catalog.table(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb.filter(col("vec_id") < 20), emb, k = 5)
          .withColumn("rank", col("rank").cast("long"))
      },
      Some(s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ${cosSql("q", "c")} AS cos
        |  FROM q, embeddings c WHERE q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cos, rank
        |FROM ranked WHERE rank <= 5""".stripMargin)),

    // Embedding-cosine near-dup pairs (exact; threshold 0.4). The exact
    // mode is PINNED (exactLimit = MaxValue) because this entry carries
    // the exact all-pairs oracle — the library default's corpus-size
    // auto-switch to IVF candidates would silently break the contract at
    // larger SFs.
    Entry(
      "embedding_near_dup",
      (s, dir) => Similarity.cosineNearDupPairs(
        Catalog.table(s, dir, "embeddings"), threshold = 0.4,
        exactLimit = Long.MaxValue),
      Some(s"""WITH p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    ${cosSql("a", "b")} AS cos
        |  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
        |SELECT * FROM p WHERE cos >= 0.4""".stripMargin)),

    // Semantic decontamination: the embedding-space sibling of the n-gram
    // `decontaminate` gate — an md5-bucketed ~5% of vectors stands in for
    // the held-out eval suite, every train vector is scored against it
    // (broadcast eval, no pair-space materialization), flagged at
    // cosine ≥ 0.4. Catches the paraphrase leakage exact n-grams miss.
    Entry(
      "semantic_decontaminate",
      (s, dir) => {
        val emb = Catalog.table(s, dir, "embeddings")
        val isEval = graft.ops.HashSplit.bucket(col("vec_id"), 100) < 5
        Similarity.semanticDecontaminate(
          emb.filter(!isEval), emb.filter(isEval), threshold = 0.4)
      },
      Some(s"""WITH ev AS (
        |  SELECT * FROM embeddings
        |  WHERE ${graft.ops.HashSplit.bucketSql("vec_id", 100)} < 5),
        |tr AS (
        |  SELECT * FROM embeddings
        |  WHERE NOT (${graft.ops.HashSplit.bucketSql("vec_id", 100)} < 5)),
        |p AS (
        |  SELECT a.vec_id, ${cosSql("a", "b")} AS cos
        |  FROM tr a, ev b)
        |SELECT vec_id,
        |  CAST(SUM(CASE WHEN cos >= 0.4 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hits,
        |  MAX(cos) AS max_cos,
        |  (CAST(SUM(CASE WHEN cos >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) > 0)
        |    AS contaminated
        |FROM p GROUP BY vec_id""".stripMargin)),

    // Hybrid retrieve-then-rerank (the RAG candidate-fusion shape):
    // vector recall brings 10 candidates per query, then a fused score —
    // 0.8·cosine + 0.2·document quality (stopword-ratio prose signal,
    // embeddings align 1:1 with documents via vec_id = doc_id) — picks
    // the final 5. Richer signals are only ever computed on the k
    // candidates, never the corpus; the quality side is a doc-keyed
    // broadcast join onto the tiny candidate set. Fused scores are
    // rounded to 9 decimals BEFORE the re-rank on both engines so a
    // last-ulp double cannot flip an ordering.
    Entry(
      "hybrid_rerank",
      (s, dir) => {
        val emb = Catalog.table(s, dir, "embeddings")
        val cand = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 20), emb, k = 10)
          .select(col("query_id"), col("neighbor_id"), col("cos"))
        val docs = Catalog.table(s, dir, "documents")
        val quality = docs.select(col("doc_id"),
          graft.text.TextAnalysis.tokensWs(col("text")).as("tok"),
          graft.text.TextAnalysis.wordHits(col("text"),
            graft.text.TextAnalysis.stopwords).as("stop"))
          .select(col("doc_id"),
            when(col("tok") > 0,
              round(col("stop").cast("double") / col("tok").cast("double"), 9))
              .otherwise(0.0).as("quality"))
        val fused = cand
          .join(quality, cand("neighbor_id") === quality("doc_id"))
          .select(col("query_id"), col("neighbor_id"), col("cos"),
            col("quality"),
            round(lit(0.8) * col("cos") + lit(0.2) * col("quality"), 9)
              .as("fused"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("fused").desc, col("neighbor_id"))
        fused.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
      },
      Some(s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ${cosSql("q", "c")} AS cos
        |  FROM q, embeddings c WHERE q.vec_id <> c.vec_id),
        |cand AS (
        |  SELECT query_id, neighbor_id, cos FROM (
        |    SELECT *, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS r0
        |    FROM scored) WHERE r0 <= 10),
        |qual AS (
        |  SELECT doc_id,
        |    CASE WHEN tok > 0
        |      THEN round(CAST(stop AS DOUBLE) / CAST(tok AS DOUBLE), 9)
        |      ELSE 0.0 END AS quality
        |  FROM (
        |    SELECT doc_id,
        |      CAST(length(regexp_extract_all(trim(text), '\\S+')) AS BIGINT)
        |        AS tok,
        |      CAST(length(regexp_extract_all(text, '\\b(the|a)\\b')) AS BIGINT)
        |        AS stop
        |    FROM documents)),
        |fused AS (
        |  SELECT t.query_id, t.neighbor_id, t.cos, u.quality,
        |    round(0.8 * t.cos + 0.2 * u.quality, 9) AS fused
        |  FROM cand t JOIN qual u ON t.neighbor_id = u.doc_id),
        |ranked AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (
        |    PARTITION BY query_id ORDER BY fused DESC, neighbor_id)
        |    AS BIGINT) AS rank
        |  FROM fused)
        |SELECT query_id, neighbor_id, cos, quality, fused, rank
        |FROM ranked WHERE rank <= 5""".stripMargin)),

    // IVF-bucketed ANN (scale path; approximate ⇒ rows-only, recall
    // covered by SimilaritySpec against brute force).
    Entry(
      "ann_ivf",
      (s, dir) => {
        val emb = Catalog.table(s, dir, "embeddings")
        Similarity.ivfTopK(emb.filter(col("vec_id") < 20), emb, k = 5, nCells = 8)
          .select(col("query_id"), col("neighbor_id"), col("cos"),
            col("rank").cast("long").as("rank"))
      },
      None),

    // Stored-index ANN: assignment written at ingest (parquet partitioned
    // by cell_id), search scans ONLY the probed cells' partitions —
    // the "assignment rides with the data" 100 TB shape demonstrated
    // end-to-end (partition pruning pinned by SimilaritySpec).
    Entry(
      "ann_ivf_indexed",
      (s, dir) => {
        val emb = Catalog.table(s, dir, "embeddings")
        val tmp = java.nio.file.Files.createTempDirectory("graft-ivf")
        val root = tmp.toString + "/index"
        // finally, not success-path: a throw mid-build/search must not
        // leak the temp index (r9 ADVICE); deletion is idempotent and
        // safe after the checkpoint materializes the result
        try {
          Similarity.writeIvfIndex(emb, nCells = 8, root)
          Similarity.searchIvfIndex(s, root,
            emb.filter(col("vec_id") < 20), k = 5)
            .select(col("query_id"), col("neighbor_id"), col("cos"),
              col("rank").cast("long").as("rank"))
            .localCheckpoint(true) // materialize, then reclaim the temp index
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      },
      None),

    // IVF recall audit — the relational recall@5 of the IVF search
    // mechanics (cell assignment, probe fan-out, candidate join, ranking)
    // against exact brute force, per probe count. Uses the DETERMINISTIC
    // first-nCells centroids (kmeansCells = false) so BOTH sides render
    // to DuckDB exactly and the recall numbers are hash-checked — the
    // k-means entries above keep their no-oracle status, but the search
    // path's quality becomes a verified quantity (recall must be monotone
    // in probes: the candidate set only grows).
    Entry(
      "ann_recall_audit",
      (s, dir) => {
        val emb = Catalog.table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 20)
        val full = Similarity.bruteForceTopK(queries, emb, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        def recallAt(p: Int) = {
          val ivf = Similarity.ivfTopK(queries, emb, k = 5, nCells = 8,
            kmeansCells = false, probes = p)
            .select(col("query_id"), col("neighbor_id"))
            .withColumn("__hit", lit(1))
          // left join (not semi): a query with zero overlap must still
          // report 0, not vanish (the truncated_recall rule)
          full.join(ivf, Seq("query_id", "neighbor_id"), "left")
            .groupBy("query_id").agg(
              count(col("__hit")).as("n_overlap"),
              count(lit(1)).as("k"))
            .select(lit(p).as("probes"), col("query_id"), col("n_overlap"),
              round(col("n_overlap").cast("double") / col("k").cast("double"),
                9).as("recall_at_5"))
        }
        recallAt(1).unionByName(recallAt(2))
      },
      Some {
        // candidate stage per probe count: probed query cells × the
        // corpus's single-cell assignment, exact cosine re-rank
        def ivfAt(name: String, probes: Int) =
          s"""$name AS (
             |  SELECT query_id, neighbor_id FROM (
             |    SELECT qa.query_id, ca.neighbor_id,
             |      ${cosSql("qv", "cv")} AS cos,
             |      ROW_NUMBER() OVER (PARTITION BY qa.query_id
             |        ORDER BY ${cosSql("qv", "cv")} DESC, ca.neighbor_id)
             |        AS rank
             |    FROM qa JOIN ca ON qa.cell_id = ca.cell_id
             |      AND qa.rn <= $probes
             |    JOIN embeddings qv ON qv.vec_id = qa.query_id
             |    JOIN embeddings cv ON cv.vec_id = ca.neighbor_id
             |    WHERE qa.query_id <> ca.neighbor_id) t
             |  WHERE rank <= 5)""".stripMargin
        def recallAt(name: String, ivf: String, probes: Int) =
          s"""SELECT $probes AS probes, f.query_id,
             |  CAST(COUNT(i.query_id) AS BIGINT) AS n_overlap,
             |  ROUND(CAST(COUNT(i.query_id) AS DOUBLE)
             |    / CAST(COUNT(*) AS DOUBLE), 9) AS recall_at_5
             |FROM f LEFT JOIN $ivf i ON f.query_id = i.query_id
             |  AND f.neighbor_id = i.neighbor_id
             |GROUP BY f.query_id""".stripMargin
        s"""WITH f AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |        ORDER BY ${cosSql("q", "c")} DESC, c.vec_id) AS rank
           |    FROM (SELECT vec_id, embedding FROM embeddings
           |          WHERE vec_id < 20) q,
           |      embeddings c
           |    WHERE q.vec_id <> c.vec_id) t
           |  WHERE rank <= 5),
           |cent AS (SELECT vec_id AS cell_id, embedding FROM embeddings
           |         ORDER BY vec_id LIMIT 8),
           |ca AS (
           |  SELECT vec_id AS neighbor_id, cell_id FROM (
           |    SELECT e.vec_id, c.cell_id,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${cosSql("e", "c")} DESC, c.cell_id) AS rn
           |    FROM embeddings e, cent c) t
           |  WHERE rn = 1),
           |qa AS (
           |  SELECT vec_id AS query_id, cell_id, rn FROM (
           |    SELECT e.vec_id, c.cell_id,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${cosSql("e", "c")} DESC, c.cell_id) AS rn
           |    FROM (SELECT * FROM embeddings WHERE vec_id < 20) e, cent c)
           |      t
           |  WHERE rn <= 2),
           |${ivfAt("ivf1", 1)},
           |${ivfAt("ivf2", 2)}
           |${recallAt("r1", "ivf1", 1)}
           |UNION ALL
           |${recallAt("r2", "ivf2", 2)}""".stripMargin
      }),

    // Incremental IVF index: build over the first half of the corpus,
    // APPEND the second half against the stored centroids
    // (Similarity.appendIvfIndex — batch-only assignment, the stored
    // corpus is never rescanned), then search the appended index. Cell
    // assignment is a pure function of (vector, centroids), so the
    // appended index is IDENTICAL to a full rebuild under the same
    // centroids — the oracle expresses that rebuilt search directly in
    // SQL (deterministic first-8 centroids, the ann_recall_audit
    // convention), hash-proving the append path end-to-end.
    Entry(
      "ann_ivf_append",
      (s, dir) => {
        val emb = Catalog.table(s, dir, "embeddings")
        val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-app")
        val root = tmp.toString + "/index"
        // finally, not success-path (r9 ADVICE): a throw mid-append must
        // not leak the temp index; the checkpoint materializes the result
        // before the backing store goes away
        try {
          Similarity.writeIvfIndex(emb.filter(col("vec_id") < 250),
            nCells = 8, root, kmeansCells = false)
          // the fence is exercised on purpose: the same batch appended
          // TWICE under one batchId must land exactly once
          Similarity.appendIvfIndex(emb.filter(col("vec_id") >= 250), root,
            batchId = "tail")
          Similarity.appendIvfIndex(emb.filter(col("vec_id") >= 250), root,
            batchId = "tail")
          Similarity.searchIvfIndex(s, root,
            emb.filter(col("vec_id") < 20), k = 5)
            .select(col("query_id"), col("neighbor_id"), col("cos"),
              col("rank").cast("long").as("rank"))
            .localCheckpoint(true)
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      },
      Some(s"""WITH cent AS (
        |  SELECT vec_id AS cell_id, embedding FROM embeddings
        |  ORDER BY vec_id LIMIT 8),
        |ca AS (
        |  SELECT vec_id AS neighbor_id, cell_id FROM (
        |    SELECT e.vec_id, c.cell_id,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY ${cosSql("e", "c")} DESC, c.cell_id) AS rn
        |    FROM embeddings e, cent c) t
        |  WHERE rn = 1),
        |qa AS (
        |  SELECT vec_id AS query_id, cell_id, rn FROM (
        |    SELECT e.vec_id, c.cell_id,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY ${cosSql("e", "c")} DESC, c.cell_id) AS rn
        |    FROM (SELECT * FROM embeddings WHERE vec_id < 20) e, cent c)
        |      t
        |  WHERE rn <= 2)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT qa.query_id, ca.neighbor_id,
        |    ${cosSql("qv", "cv")} AS cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY qa.query_id
        |      ORDER BY ${cosSql("qv", "cv")} DESC, ca.neighbor_id)
        |      AS BIGINT) AS rank
        |  FROM qa JOIN ca ON qa.cell_id = ca.cell_id
        |  JOIN embeddings qv ON qv.vec_id = qa.query_id
        |  JOIN embeddings cv ON cv.vec_id = ca.neighbor_id
        |  WHERE qa.query_id <> ca.neighbor_id) t
        |WHERE rank <= 5""".stripMargin)),

    // Hard-negative mining (Similarity.hardNegatives): per query vector,
    // the top-5 most-similar DIFFERENT-label corpus vectors — the
    // contrastive-training pair generator. Brute-force baseline oracled
    // exactly; the scale path is the same label predicate inside the IVF
    // candidate join (see the operator scaladoc).
    Entry(
      "hard_negative_mining",
      (s, dir) => {
        val emb = Catalog.table(s, dir, "embeddings")
        Similarity.hardNegatives(emb.filter(col("vec_id") < 20), emb, k = 5)
          .withColumn("rank", col("rank").cast("long"))
      },
      Some(s"""WITH q AS (
        |  SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.vec_id AS query_id, q.label AS query_label,
        |    c.vec_id AS neighbor_id, c.label AS neighbor_label,
        |    ${cosSql("q", "c")} AS cos
        |  FROM q, embeddings c
        |  WHERE q.vec_id <> c.vec_id
        |    AND q.label IS DISTINCT FROM c.label),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, query_label, neighbor_id, neighbor_label, cos,
        |  CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 5""".stripMargin)),

    // The IVF scale path of hard-negative mining, fully oracled via the
    // deterministic first-8 centroids (the ann_ivf_append convention):
    // assignment rank-1 for the corpus, rank<=2 probes for the queries,
    // the different-label predicate applied inside the cell join.
    Entry(
      "hard_negative_mining_ivf",
      (s, dir) => {
        val emb = Catalog.table(s, dir, "embeddings")
        Similarity.hardNegativesIvf(emb.filter(col("vec_id") < 20), emb,
          k = 5, nCells = 8, kmeansCells = false)
          .withColumn("rank", col("rank").cast("long"))
      },
      Some(s"""WITH cent AS (
        |  SELECT vec_id AS cell_id, embedding FROM embeddings
        |  ORDER BY vec_id LIMIT 8),
        |ca AS (
        |  SELECT vec_id AS neighbor_id, cell_id FROM (
        |    SELECT e.vec_id, c.cell_id,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY ${cosSql("e", "c")} DESC, c.cell_id) AS rn
        |    FROM embeddings e, cent c) t
        |  WHERE rn = 1),
        |qa AS (
        |  SELECT vec_id AS query_id, cell_id FROM (
        |    SELECT e.vec_id, c.cell_id,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY ${cosSql("e", "c")} DESC, c.cell_id) AS rn
        |    FROM (SELECT * FROM embeddings WHERE vec_id < 20) e, cent c) t
        |  WHERE rn <= 2)
        |SELECT query_id, query_label, neighbor_id, neighbor_label, cos,
        |  CAST(rank AS BIGINT) AS rank
        |FROM (
        |  SELECT qa.query_id, qv.label AS query_label,
        |    ca.neighbor_id, cv.label AS neighbor_label,
        |    ${cosSql("qv", "cv")} AS cos,
        |    ROW_NUMBER() OVER (PARTITION BY qa.query_id
        |      ORDER BY ${cosSql("qv", "cv")} DESC, ca.neighbor_id) AS rank
        |  FROM qa JOIN ca ON qa.cell_id = ca.cell_id
        |  JOIN embeddings qv ON qv.vec_id = qa.query_id
        |  JOIN embeddings cv ON cv.vec_id = ca.neighbor_id
        |  WHERE qa.query_id <> ca.neighbor_id
        |    AND qv.label IS DISTINCT FROM cv.label) t
        |WHERE rank <= 5""".stripMargin)),

    // Hard-negative recall audit — the oracled floor the IVF mining path
    // was missing (ann_recall_audit's treatment applied to the label-
    // filtered variant): per query and probe count, how many of the
    // exact brute-force hard negatives the IVF candidate path recovers.
    // Deterministic first-8 centroids render both engines exactly, so
    // the recall numbers themselves are hash-checked — a regression in
    // the cell join, probe fan-out, or label predicate changes a pinned
    // value instead of sliding past a loose assertion.
    Entry(
      "hard_negative_recall_audit",
      (s, dir) => {
        val emb = Catalog.table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 20)
        val full = Similarity.hardNegatives(queries, emb, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        def recallAt(p: Int) = {
          val ivf = Similarity.hardNegativesIvf(queries, emb, k = 5,
            nCells = 8, kmeansCells = false, probes = p)
            .select(col("query_id"), col("neighbor_id"))
            .withColumn("__hit", lit(1))
          // left join (not semi): zero-overlap queries must report 0
          full.join(ivf, Seq("query_id", "neighbor_id"), "left")
            .groupBy("query_id").agg(
              count(col("__hit")).as("n_overlap"),
              count(lit(1)).as("k"))
            .select(lit(p).as("probes"), col("query_id"), col("n_overlap"),
              round(col("n_overlap").cast("double") / col("k").cast("double"),
                9).as("recall_at_5"))
        }
        recallAt(1).unionByName(recallAt(2))
      },
      Some {
        def ivfAt(name: String, probes: Int) =
          s"""$name AS (
             |  SELECT query_id, neighbor_id FROM (
             |    SELECT qa.query_id, ca.neighbor_id,
             |      ROW_NUMBER() OVER (PARTITION BY qa.query_id
             |        ORDER BY ${cosSql("qv", "cv")} DESC, ca.neighbor_id)
             |        AS rank
             |    FROM qa JOIN ca ON qa.cell_id = ca.cell_id
             |      AND qa.rn <= $probes
             |    JOIN embeddings qv ON qv.vec_id = qa.query_id
             |    JOIN embeddings cv ON cv.vec_id = ca.neighbor_id
             |    WHERE qa.query_id <> ca.neighbor_id
             |      AND qv.label IS DISTINCT FROM cv.label) t
             |  WHERE rank <= 5)""".stripMargin
        def recallAt(ivf: String, probes: Int) =
          s"""SELECT $probes AS probes, f.query_id,
             |  CAST(COUNT(i.query_id) AS BIGINT) AS n_overlap,
             |  ROUND(CAST(COUNT(i.query_id) AS DOUBLE)
             |    / CAST(COUNT(*) AS DOUBLE), 9) AS recall_at_5
             |FROM f LEFT JOIN $ivf i ON f.query_id = i.query_id
             |  AND f.neighbor_id = i.neighbor_id
             |GROUP BY f.query_id""".stripMargin
        s"""WITH f AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |        ORDER BY ${cosSql("q", "c")} DESC, c.vec_id) AS rank
           |    FROM (SELECT vec_id, embedding, label FROM embeddings
           |          WHERE vec_id < 20) q,
           |      embeddings c
           |    WHERE q.vec_id <> c.vec_id
           |      AND q.label IS DISTINCT FROM c.label) t
           |  WHERE rank <= 5),
           |cent AS (SELECT vec_id AS cell_id, embedding FROM embeddings
           |         ORDER BY vec_id LIMIT 8),
           |ca AS (
           |  SELECT vec_id AS neighbor_id, cell_id FROM (
           |    SELECT e.vec_id, c.cell_id,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${cosSql("e", "c")} DESC, c.cell_id) AS rn
           |    FROM embeddings e, cent c) t
           |  WHERE rn = 1),
           |qa AS (
           |  SELECT vec_id AS query_id, cell_id, rn FROM (
           |    SELECT e.vec_id, c.cell_id,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${cosSql("e", "c")} DESC, c.cell_id) AS rn
           |    FROM (SELECT * FROM embeddings WHERE vec_id < 20) e, cent c)
           |      t
           |  WHERE rn <= 2),
           |${ivfAt("ivf1", 1)},
           |${ivfAt("ivf2", 2)}
           |${recallAt("ivf1", 1)}
           |UNION ALL
           |${recallAt("ivf2", 2)}""".stripMargin
      }),

    // IVF index-health drift metric over the full append lifecycle
    // (Similarity.ivfDriftMetric): build on the first half, append the
    // second, then measure per-cell member count + mean intra-cell
    // cosine — the scalar a maintenance job watches to schedule the
    // recentroid compaction. Deterministic first-8 centroids make the
    // whole lifecycle SQL-expressible: assignment is rank-1 cosine (the
    // ann_ivf_append convention), cohesion sums 9-dp cosines in
    // DECIMAL(28,9) (exact, order-free) with one final IEEE division.
    Entry(
      "ann_ivf_drift",
      (s, dir) => {
        val emb = Catalog.table(s, dir, "embeddings")
        val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-drift")
        val root = tmp.toString + "/index"
        try {
          Similarity.writeIvfIndex(emb.filter(col("vec_id") < 250),
            nCells = 8, root, kmeansCells = false)
          Similarity.appendIvfIndex(emb.filter(col("vec_id") >= 250), root,
            batchId = "tail")
          Similarity.ivfDriftMetric(s, root)
            .localCheckpoint(true) // materialize, then reclaim the temp index
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      },
      Some(s"""WITH cent AS (
        |  SELECT vec_id AS cell_id, embedding FROM embeddings
        |  ORDER BY vec_id LIMIT 8),
        |ca AS (
        |  SELECT vec_id, cell_id FROM (
        |    SELECT e.vec_id, c.cell_id,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY ${cosSql("e", "c")} DESC, c.cell_id) AS rn
        |    FROM embeddings e, cent c) t
        |  WHERE rn = 1)
        |SELECT ca.cell_id, CAST(COUNT(*) AS BIGINT) AS n_members,
        |  CAST(SUM(CAST(${cosSql("e", "c")} AS DECIMAL(28,9))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS mean_cos
        |FROM ca
        |JOIN embeddings e ON e.vec_id = ca.vec_id
        |JOIN cent c ON c.cell_id = ca.cell_id
        |GROUP BY ca.cell_id""".stripMargin)),

    // Affine int8 quantization audit (Quantize scaladoc): per-dimension
    // global stats → one broadcast row of aligned arrays → pure per-row
    // transform; q_sum is the order-independent integer checksum that
    // pins every quantized code through the oracle.
    Entry(
      "embedding_quantize",
      (s, dir) => graft.similarity.Quantize.auditInt8(
        Catalog.table(s, dir, "embeddings")),
      Some("""WITH ex AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding) AS x
        |  FROM embeddings),
        |st AS (
        |  SELECT i, min(CAST(x AS DOUBLE)) AS mn, max(CAST(x AS DOUBLE)) AS mx
        |  FROM ex GROUP BY i),
        |qe AS (
        |  SELECT vec_id,
        |    CASE WHEN mx = mn THEN 0
        |      ELSE CAST(ROUND((CAST(x AS DOUBLE) - mn) / ((mx - mn) / 255.0))
        |        AS BIGINT) END AS q,
        |    CASE WHEN mx = mn THEN 0.0
        |      ELSE ABS(CAST(x AS DOUBLE) - (mn
        |        + CAST(ROUND((CAST(x AS DOUBLE) - mn) / ((mx - mn) / 255.0))
        |            AS DOUBLE)
        |          * ((mx - mn) / 255.0))) END AS err
        |  FROM ex JOIN st USING (i))
        |SELECT vec_id, COUNT(*) AS n_dims, MIN(q) AS q_min, MAX(q) AS q_max,
        |  CAST(SUM(q) AS BIGINT) AS q_sum,
        |  ROUND(MAX(err), 9) AS max_abs_err
        |FROM qe GROUP BY vec_id""".stripMargin)),

    // Truncated-embedding recall audit (the Matryoshka / dimension-cut
    // question): exact top-5 under the 16-dim PREFIX vs the full 64-dim
    // top-5, overlap per query — the cost/quality readout before
    // shipping a 4× cheaper index. Both rankings are the exact
    // brute-force operator; recall is exact integer overlap. At corpus
    // scale the truncated side is the candidate stage (4× less data
    // per distance), the full side its re-rank — this entry certifies
    // what the cut costs.
    Entry(
      "truncated_recall",
      (s, dir) => {
        val emb = Catalog.table(s, dir, "embeddings")
        val trunc = emb.select(col("vec_id"),
          slice(col("embedding"), 1, 16).as("embedding"))
        val full = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 20), emb, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val cut = Similarity.bruteForceTopK(
          trunc.filter(col("vec_id") < 20), trunc, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        // left join (not semi): a query whose truncated list shares
        // NOTHING with the full list must still report 0, not vanish
        full.join(cut.withColumn("__hit", lit(1)),
            Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id").agg(
            count(col("__hit")).as("n_overlap"),
            count(lit(1)).as("k"))
          .select(col("query_id"), col("n_overlap"),
            round(col("n_overlap").cast("double")
              / col("k").cast("double"), 9).as("recall_at_5"))
      },
      Some {
        def ranked(name: String, dims: Int) =
          s"""$name AS (
             |  SELECT * FROM (
             |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
             |        ORDER BY ${cosSql("q", "c", dims)} DESC, c.vec_id)
             |        AS rank
             |    FROM (SELECT vec_id, embedding FROM embeddings
             |          WHERE vec_id < 20) q,
             |      embeddings c
             |    WHERE q.vec_id <> c.vec_id) t
             |  WHERE rank <= 5)""".stripMargin
        s"""WITH ${ranked("f", 64)},
           |${ranked("tr", 16)},
           |ov AS (
           |  SELECT f.query_id, COUNT(*) AS n_overlap
           |  FROM f JOIN tr ON f.query_id = tr.query_id
           |    AND f.neighbor_id = tr.neighbor_id
           |  GROUP BY f.query_id),
           |kk AS (SELECT query_id, COUNT(*) AS k FROM f GROUP BY query_id)
           |SELECT kk.query_id,
           |  CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           |  ROUND(CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE)
           |    / CAST(kk.k AS DOUBLE), 9) AS recall_at_5
           |FROM kk LEFT JOIN ov ON kk.query_id = ov.query_id""".stripMargin
      }),

    // Deterministic top principal component of the 16-dim embedding
    // prefix: exact quantized covariance (one d²-row hash aggregate)
    // plus an 8-step ROUND9-quantized power iteration — an iterative
    // numerical algorithm hash-proven cross-engine (the Markov/BPE
    // unrolled-oracle treatment; EmbeddingPca scaladoc).
    Entry(
      "embedding_pca",
      (s, dir) => graft.similarity.EmbeddingPca.topComponent(
        Catalog.table(s, dir, "embeddings"), d = 16, steps = 8),
      Some {
        val d = 16
        val steps = 8
        val v0 = java.math.BigDecimal.ONE.divide(
          new java.math.BigDecimal(d), 9, java.math.RoundingMode.HALF_UP)
        val stepCtes = (1 to steps).map { k =>
          s"""w$k AS (
             |  SELECT c.i, CAST(SUM(ROUND(c.c * v.v, 9)) AS DECIMAL(18,9))
             |    AS w
             |  FROM cov c JOIN v${k - 1} v ON v.i = c.j GROUP BY c.i),
             |s$k AS (
             |  SELECT CAST(SUM(ROUND(w * w, 9)) AS DECIMAL(18,9)) AS ssq
             |  FROM w$k),
             |v$k AS (
             |  SELECT i, CAST(ROUND(CAST(w AS DOUBLE)
             |    / SQRT(CAST(ssq AS DOUBLE)), 9) AS DECIMAL(18,9)) AS v
             |  FROM w$k, s$k)""".stripMargin
        }.mkString(",\n")
        s"""WITH nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM embeddings),
        |ij AS (SELECT a.range AS i, b.range AS j
        |  FROM range($d) a, range($d) b),
        |sij AS (
        |  SELECT ij.i, ij.j,
        |    CAST(SUM(CAST(CAST(embedding[ij.i + 1] AS DOUBLE)
        |      * CAST(embedding[ij.j + 1] AS DOUBLE) AS DECIMAL(28,8)))
        |      AS DECIMAL(28,8)) AS sij
        |  FROM embeddings CROSS JOIN ij GROUP BY ij.i, ij.j),
        |si AS (
        |  SELECT r.range AS i,
        |    CAST(SUM(CAST(CAST(embedding[r.range + 1] AS DOUBLE)
        |      AS DECIMAL(28,8))) AS DECIMAL(28,8)) AS s
        |  FROM embeddings CROSS JOIN range($d) r GROUP BY r.range),
        |cov AS (
        |  SELECT sij.i, sij.j,
        |    CAST(ROUND(CAST(sij AS DOUBLE) / nn.n
        |      - (CAST(a.s AS DOUBLE) / nn.n) * (CAST(b.s AS DOUBLE) / nn.n),
        |      9) AS DECIMAL(18,9)) AS c
        |  FROM sij JOIN si a ON a.i = sij.i JOIN si b ON b.i = sij.j
        |  CROSS JOIN nn),
        |v0 AS (SELECT r.range AS i, CAST($v0 AS DECIMAL(18,9)) AS v
        |  FROM range($d) r),
        |$stepCtes,
        |cv AS (
        |  SELECT c.i, CAST(SUM(ROUND(c.c * v.v, 9)) AS DECIMAL(18,9)) AS w
        |  FROM cov c JOIN v$steps v ON v.i = c.j GROUP BY c.i),
        |lam AS (
        |  SELECT CAST(SUM(ROUND(v.v * cv.w, 9)) AS DECIMAL(18,9)) AS lambda
        |  FROM v$steps v JOIN cv ON cv.i = v.i),
        |tr AS (SELECT CAST(SUM(c) AS DECIMAL(18,9)) AS trace
        |  FROM cov WHERE i = j)
        |SELECT v.i AS dim, CAST(v.v AS DOUBLE) AS loading,
        |  CAST(lam.lambda AS DOUBLE) AS lambda,
        |  CAST(lam.lambda AS DOUBLE) / CAST(tr.trace AS DOUBLE)
        |    AS var_explained
        |FROM v$steps v, lam, tr ORDER BY dim""".stripMargin
      }))
}
