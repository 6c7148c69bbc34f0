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

  /** Cosine with the zero-vector convention cos(0, ·) = 0.0: under this
    * environment's default ANSI mode a bare 0/0 would ABORT the query
    * (SparkArithmeticException), and NaN comparison semantics differ
    * between engines — a fixed 0.0 is deterministic and renders
    * identically in the oracle SQL.
    */
  def cosine(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den =!= 0.0, dot(a, b) / den).otherwise(0.0)
  }

  /** Side projection: id, vector, precomputed norm. */
  private def side(df: DataFrame, idAs: String, vecAs: String, normAs: String) =
    df.select(col("vec_id").as(idAs), col("embedding").as(vecAs),
      norm(col("embedding")).as(normAs))

  /** Zero-norm guard as in [[cosine]] (ANSI div-0 would abort). */
  private def pairCos(va: String, vb: String, na: String, nb: String): Column = {
    val den = col(na) * col(nb)
    round(when(den =!= 0.0, dot(col(va), col(vb)) / den).otherwise(0.0), 9)
  }

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

  /** Hard-negative mining for contrastive training data: for each query
    * vector, the `k` most similar corpus vectors carrying a DIFFERENT
    * `labelCol` — the near-boundary negatives contrastive objectives
    * need (random negatives are trivially separable; the informative
    * ones are the closest wrong-label examples). This is the brute-force
    * correctness baseline (the label predicate is one more filter on the
    * scored pairs); the 100 TB path composes the SAME predicate into the
    * IVF candidate join — [[ivfTopK]]'s cells are label-agnostic, so
    * filtering after the cell join changes nothing about cell recall,
    * and the per-query candidate set stays |probed cells|, never the
    * corpus. Output: query_id, query_label, neighbor_id, neighbor_label,
    * cos, rank.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
      labelCol: String = "label"): DataFrame = {
    ArrayOps.register(queries.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), norm(col("embedding")).as("nq"),
      col(labelCol).as("query_label"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), norm(col("embedding")).as("nc"),
      col(labelCol).as("neighbor_label"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id") &&
        !(col("query_label") <=> col("neighbor_label")))
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), pairCos("qv", "cv", "nq", "nc").as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The 100 TB path of [[hardNegatives]]: the same different-label
    * predicate composed into the IVF candidate join ([[ivfTopK]]'s
    * shape) — cells are label-agnostic, so the per-query candidate set
    * stays |probed cells|, never the corpus, and the label filter prunes
    * candidates before ranking. Labels ride the assignment output via an
    * id join (the corpus side is cell-partitioned; the label projection
    * joins on the id it was derived from, so AQE plans it local).
    * Recall caveat identical to [[ivfTopK]]: near-cell-border negatives
    * can be missed at low `probes`; recall is monotone in `probes`.
    */
  def hardNegativesIvf(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int, kmeansCells: Boolean = true, probes: Int = 2,
      labelCol: String = "label"): DataFrame = {
    ArrayOps.register(queries.sparkSession)
    val centroids =
      if (kmeansCells) kmeansCentroids(corpus, nCells)
      else corpus.orderBy(col("vec_id")).limit(nCells)
        .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"),
          norm(col("embedding")).as("ncent"))
    val corpusCells = assign(side(corpus, "neighbor_id", "cv", "nc"),
      "neighbor_id", "cv", "nc", centroids, probes = 1)
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col(labelCol).as("neighbor_label")), Seq("neighbor_id"))
    val queryCells = assign(side(queries, "query_id", "qv", "nq"),
      "query_id", "qv", "nq", centroids, probes = probes)
      .join(queries.select(col("vec_id").as("query_id"),
        col(labelCol).as("query_label")), Seq("query_id"))
    val scored = queryCells.join(corpusCells, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id") &&
        !(col("query_label") <=> col("neighbor_label")))
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), pairCos("qv", "cv", "nq", "nc").as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Seeded k-means coarse centroids for IVF cells — (cell_id, centroid,
    * ncent). Fit runs on a deterministic sample capped at `sampleCap`
    * rows: centroid QUALITY needs a representative sample, not the full
    * corpus, so at 100 TB the fit stays a bounded driver-coordinated job
    * while assignment (the data-sized pass) remains a broadcast map.
    */
  def kmeansCentroids(corpus: DataFrame, nCells: Int, seed: Long = 42L,
      sampleCap: Long = 100000L, knownCount: Option[Long] = None): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    ArrayOps.register(spark) // the ncent column below uses graft_dot
    val n = knownCount.getOrElse(corpus.count())
    val sampled =
      if (n <= sampleCap) corpus
      else corpus.sample(withReplacement = false, sampleCap.toDouble / n, seed)
    val feats = sampled
      .select(array_to_vector(col("embedding").cast("array<double>")).as("features"))
      .cache()
    try {
      val sampleN = feats.count()
      val centers =
        if (sampleN == 0) Seq.empty[(Long, Array[Double])] // empty corpus → no cells
        else {
          val k = math.max(1, math.min(nCells.toLong, sampleN).toInt)
          // random init, not k-means||: the parallel init runs several
          // extra distributed passes to seed centroids that a COARSE
          // quantizer doesn't need (faiss trains its IVF quantizer from
          // a random subset too) — recall is pinned by SimilaritySpec
          new KMeans().setK(k).setSeed(seed).setMaxIter(10)
            .setInitMode("random").fit(feats)
            .clusterCenters.toSeq.zipWithIndex
            .map { case (v, i) => (i.toLong, v.toArray) }
        }
      centers.toDF("cell_id", "centroid")
        .withColumn("ncent", norm(col("centroid")))
    } finally { feats.unpersist(); () }
  }

  /** Nearest-`probes` cell assignment against broadcast centroids.
    *
    * Per-id ranking is a partial-aggregable `max(struct(ccos, …))`, NOT a
    * `row_number` window: the window would shuffle all n×cells scored
    * rows to rank them, while the aggregate combines map-side down to one
    * row per id before any exchange — the difference between an n×cells
    * and an n shuffle on the data-sized pass of every IVF operator. Ties
    * break to the smaller cell_id (struct orders ccos DESC via max, then
    * -cell_id), matching the previous window semantics. Extra probes run
    * one exclusion pass each: re-score against the broadcast centroids,
    * keep the best cell not already assigned — O(probes·n) shuffle rows.
    */
  private def assign(df: DataFrame, idCol: String, vecCol: String,
      nCol: String, centroids: DataFrame, probes: Int): DataFrame = {
    def bestPass(base: DataFrame): DataFrame =
      base.crossJoin(broadcast(centroids))
        .filter(!array_contains(col("__excluded"), col("cell_id")))
        .select(col(idCol), col(vecCol), col(nCol), col("__excluded"),
          col("cell_id"), pairCos(vecCol, "centroid", nCol, "ncent").as("ccos"))
        .groupBy(col(idCol))
        .agg(
          first(col(vecCol)).as(vecCol),
          first(col(nCol)).as(nCol),
          first(col("__excluded")).as("__excluded"),
          max(struct(col("ccos"), (-col("cell_id")).as("nc"),
            col("cell_id").as("cell"))).as("__best"))
        .withColumn("cell_id", col("__best").getField("cell"))
        .drop("__best")

    var base = df.withColumn("__excluded", array().cast("array<bigint>"))
    val out = Seq.newBuilder[DataFrame]
    for (_ <- 1 to probes) {
      val b = bestPass(base)
      out += b.select(col(idCol), col(vecCol), col(nCol), col("cell_id"))
      base = b
        .withColumn("__excluded", array_union(col("__excluded"), array(col("cell_id"))))
        .drop("cell_id")
    }
    out.result().reduce(_ unionByName _)
  }

  /** IVF-style ANN: coarse-quantize the corpus against seeded k-means
    * centroids (or, with `kmeansCells = false`, the first `nCells`
    * vectors — the cheap stand-in kept for comparison), search only the
    * query's cell. Approximate (recall < 1 near cell borders) — the scale
    * path, verified by unit test against brute force recall.
    *
    * NOTE: with `kmeansCells = true`, CONSTRUCTION is eager — fitting the
    * coarse quantizer runs Spark jobs (count + sampled k-means) before
    * the returned DataFrame exists. Callers that only need a plan should
    * pass `kmeansCells = false`.
    *
    * `probes` defaults to 2: near-cell-border queries are the known IVF
    * recall weakness, and probing the second-nearest cell recovers most
    * of them for one extra candidate pass over the QUERY side only (the
    * corpus assignment is always single-cell). SimilaritySpec reports
    * measured recall@k for probes ∈ {1, 2} against brute force.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nCells: Int,
      kmeansCells: Boolean = true, probes: Int = 2): DataFrame = {
    ArrayOps.register(queries.sparkSession)
    val centroids =
      if (kmeansCells) kmeansCentroids(corpus, nCells)
      else corpus.orderBy(col("vec_id")).limit(nCells)
        .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"),
          norm(col("embedding")).as("ncent"))
    // standard IVF: every corpus vector lives in exactly one cell; the
    // QUERY probes its `probes` nearest cells (recall is monotone in
    // `probes` — the candidate set only grows)
    val corpusCells = assign(side(corpus, "neighbor_id", "cv", "nc"),
      "neighbor_id", "cv", "nc", centroids, probes = 1)
    val queryCells = assign(side(queries, "query_id", "qv", "nq"),
      "query_id", "qv", "nq", centroids, probes = probes)
    val scored = queryCells.join(corpusCells, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        pairCos("qv", "cv", "nq", "nc").as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Write a persistent IVF index: the corpus with its cell assignment,
    * parquet-partitioned BY cell_id, plus the centroid table — the
    * "assignment rides with the data" shape for 100 TB: assignment is
    * paid once at ingest, and a search touches only its probed cells'
    * partitions (directory-level pruning, no full scan, pinned by
    * SimilaritySpec). Precomputed norms ride along so the search never
    * re-scans vectors to normalize.
    */
  def writeIvfIndex(corpus: DataFrame, nCells: Int, root: String,
      kmeansCells: Boolean = true): Unit = {
    ArrayOps.register(corpus.sparkSession)
    val cents =
      if (kmeansCells) kmeansCentroids(corpus, nCells)
      else corpus.orderBy(col("vec_id")).limit(nCells)
        .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"),
          norm(col("embedding")).as("ncent"))
    cents.write.mode("overwrite").parquet(s"$root/centroids")
    assign(side(corpus, "vec_id", "embedding", "nv"),
      "vec_id", "embedding", "nv", cents, probes = 1)
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$root/vectors")
  }

  /** Append a batch of new vectors to an existing IVF index — the
    * incremental twin that exact dedup ([[graft.dedup.Dedup.incrementalExact]])
    * and LSH ([[graft.dedup.Dedup.incrementalLshCandidates]]) already
    * have: new vectors are assigned to their nearest EXISTING centroid
    * (one pass over the BATCH against the broadcast centroid table — the
    * stored corpus is never rescanned) and committed as a new
    * cell-partitioned batch directory. Because assignment is a pure
    * function of (vector, centroids), append-then-search is IDENTICAL to
    * rebuilding the whole index under the same centroids — the equality
    * `ann_ivf_append` hash-proves. Centroids DO drift as the data
    * distribution shifts; the compaction job is a periodic
    * [[recentroidIvfIndex]] rebuild, exactly like LSH band re-indexing.
    *
    * RETRY-IDEMPOTENT via write-fencing (the staging-then-move option the
    * r9 scaladoc only described): the batch is written under
    * `root/batches/.staging-<batchId>` (overwrite mode — a crashed
    * attempt's partial staging is replaced, never read) and committed by
    * ONE atomic directory rename to `root/batches/<batchId>`. A retry of
    * an already-committed batchId is a no-op, so driver retries can
    * never double-write a batch — the correctness hole a bare
    * `mode("append")` into the vectors directory had. `batchId` is the
    * fence key: callers must derive it from the batch identity (ingest
    * run id, source offset range), not a random value. On stores without
    * atomic rename (S3 without a committer) front this with a rename-
    * capable layer or a manifest commit.
    */
  def appendIvfIndex(newVectors: DataFrame, root: String,
      batchId: String): Unit = {
    require(batchId.nonEmpty &&
      batchId.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"appendIvfIndex: batchId must be a [A-Za-z0-9_-] token, got '$batchId'")
    val spark = newVectors.sparkSession
    ArrayOps.register(spark)
    val hconf = spark.sparkContext.hadoopConfiguration
    val dest = new org.apache.hadoop.fs.Path(s"$root/batches/$batchId")
    val fs = dest.getFileSystem(hconf)
    if (fs.exists(dest)) {
      System.err.println(s"[similarity] appendIvfIndex: batch '$batchId' " +
        "already committed — retry is a no-op")
      return
    }
    val staging = new org.apache.hadoop.fs.Path(s"$root/batches/.staging-$batchId")
    val cents = spark.read.parquet(s"$root/centroids")
    assign(side(newVectors, "vec_id", "embedding", "nv"),
      "vec_id", "embedding", "nv", cents, probes = 1)
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(staging.toString)
    if (!fs.rename(staging, dest)) {
      // a concurrent attempt won the commit race — its batch IS this batch
      fs.delete(staging, true)
      require(fs.exists(dest),
        s"appendIvfIndex: commit rename failed for batch '$batchId'")
    }
  }

  /** All live vectors of a stored index: the base build plus every
    * COMMITTED append batch (in-flight `.staging-*` directories are
    * invisible by construction). Each directory is cell_id-partitioned,
    * so a cell filter prunes every branch of the union — the scan cost
    * stays |probed cells| per generation, and generations are bounded by
    * the re-centroid cadence.
    */
  private def indexVectors(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame = {
    val base = spark.read.parquet(s"$root/vectors")
    val batchesDir = new org.apache.hadoop.fs.Path(s"$root/batches")
    val fs = batchesDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDirs =
      if (!fs.exists(batchesDir)) Seq.empty
      else fs.listStatus(batchesDir).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
        // an empty batch (no partition dirs, only _SUCCESS) has no schema
        // to read — skip it; semantically it contributes nothing anyway
        .filter(s => fs.listStatus(s.getPath)
          .exists(c => !c.getPath.getName.startsWith("_")))
        .map(_.getPath.toString).sorted
    batchDirs.foldLeft(base)((df, p) => df.unionByName(spark.read.parquet(p)))
  }

  /** Index-health metric for the append lifecycle: per cell, the member
    * count and the mean cosine of members to their OWN centroid
    * (intra-cell cohesion). [[appendIvfIndex]] never moves centroids, so
    * as appended batches drift from the original distribution, cohesion
    * falls and recall at fixed probes decays — this scalar is what a
    * maintenance job watches to decide when [[recentroidIvfIndex]] is
    * due. One scan of the stored index against the broadcast centroid
    * table; cosines are 9-dp-quantized and accumulated in DECIMAL(28,9)
    * (exact, combine-order-free), the mean is one IEEE division.
    */
  def ivfDriftMetric(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame = {
    ArrayOps.register(spark)
    val cents = spark.read.parquet(s"$root/centroids")
    indexVectors(spark, root)
      .join(broadcast(cents), Seq("cell_id"))
      .select(col("cell_id"),
        round(pairCos("embedding", "centroid", "nv", "ncent"), 9)
          .cast("decimal(28,9)").as("c"))
      .groupBy("cell_id")
      .agg(count(lit(1)).as("n_members"),
        (sum(col("c")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_cos"))
  }

  /** Periodic re-centroid compaction — the maintenance twin of
    * [[appendIvfIndex]] (same lifecycle as LSH band re-indexing): refit
    * centroids over the CURRENT stored corpus and rewrite the index under
    * `destRoot`. Written to a NEW root on purpose: Spark cannot safely
    * overwrite a path it is reading, and at 100 TB the swap is a catalog
    * pointer flip from `destRoot` to live (plus deleting the old
    * generation) — the compact-then-swap pattern every LSM-ish store
    * uses. Re-assignment is one pass over the stored vectors against the
    * (small, broadcast) refit centroids; the rewrite restores directory
    * partition pruning for whatever the append distribution did to cell
    * balance.
    */
  def recentroidIvfIndex(spark: org.apache.spark.sql.SparkSession,
      srcRoot: String, destRoot: String, nCells: Int,
      kmeansCells: Boolean = true): Unit = {
    require(srcRoot != destRoot,
      "recentroidIvfIndex: destRoot must differ from srcRoot (no in-place rewrite)")
    // the CURRENT corpus = base build + every committed append batch
    val corpus = indexVectors(spark, srcRoot)
      .select(col("vec_id"), col("embedding"))
    writeIvfIndex(corpus, nCells, destRoot, kmeansCells)
  }

  /** Drift-triggered maintenance policy — the connective tissue between
    * [[ivfDriftMetric]] (the readout) and [[recentroidIvfIndex]] (the
    * action) that r9 shipped as disconnected parts: compact when the
    * corpus-weighted mean intra-cell cohesion falls below `minMeanCos`
    * OR cell-population skew (max members / mean members) exceeds
    * `maxSkew`. Cohesion decay means appended batches drifted from the
    * frozen quantizer (recall at fixed probes falls); skew means one
    * cell absorbed the drift (its scan stops pruning). Both reduce to
    * ONE control-sized aggregate over the drift metric — the decision
    * costs one index scan, the same pass a monitoring job already runs.
    * Returns the live root: `destRoot` if compaction ran (callers flip
    * their catalog pointer and delete the old generation), else
    * `srcRoot` untouched.
    */
  def maintainIvfIndex(spark: org.apache.spark.sql.SparkSession,
      srcRoot: String, destRoot: String, nCells: Int,
      minMeanCos: Double = 0.0, maxSkew: Double = 8.0,
      kmeansCells: Boolean = true): String = {
    val m = ivfDriftMetric(spark, srcRoot).agg(
      sum(col("mean_cos") * col("n_members")).as("w"),
      sum(col("n_members")).as("n"),
      max(col("n_members")).as("mx"),
      count(lit(1)).as("cells")).head() // one control-sized row
    val n = if (m.isNullAt(1)) 0L else m.getAs[Long]("n")
    if (n == 0L) return srcRoot // empty index: nothing to compact
    val meanCos = m.getAs[Double]("w") / n.toDouble
    val skew = m.getAs[Long]("mx").toDouble /
      (n.toDouble / m.getAs[Long]("cells").toDouble)
    val due = meanCos < minMeanCos || skew > maxSkew
    System.err.println(f"[similarity] maintainIvfIndex: mean_cos=$meanCos%.4f" +
      f" (floor $minMeanCos%.2f), skew=$skew%.2f (cap $maxSkew%.2f) -> " +
      (if (due) "re-centroid" else "healthy"))
    if (due) {
      recentroidIvfIndex(spark, srcRoot, destRoot, nCells, kmeansCells)
      destRoot
    } else srcRoot
  }

  /** Top-k search against a stored IVF index. The query batch's probed
    * cell ids — at most `nCells`, a control-table-sized set like
    * `commodities_to_score` — are collected and pushed as a STATIC
    * partition filter, so the index scan reads only those directories
    * (`PartitionFilters` in the plan; the scan cost is |probed cells|,
    * not |corpus|). Ranking matches [[ivfTopK]]: rounded cosine DESC,
    * then neighbor id.
    */
  def searchIvfIndex(spark: org.apache.spark.sql.SparkSession, root: String,
      queries: DataFrame, k: Int, probes: Int = 2): DataFrame = {
    ArrayOps.register(spark)
    val cents = spark.read.parquet(s"$root/centroids")
    // localCheckpoint: the assignment is consumed TWICE — collected here
    // for the static partition filter, and re-read by the final join when
    // the returned plan executes. Without truncating the lineage the
    // centroid-scoring pass over the query batch would run both times.
    val queryCells = assign(side(queries, "query_id", "qv", "nq"),
      "query_id", "qv", "nq", cents, probes = probes)
      .localCheckpoint(true)
    val probed = queryCells.select("cell_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val index = indexVectors(spark, root)
      .filter(col("cell_id").isin(probed: _*))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        col("nv").as("nc"), col("cell_id"))
    val scored = queryCells.join(index, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        pairCos("qv", "cv", "nq", "nc").as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (dedup by semantic identity):
    * all pairs with cosine ≥ threshold.
    *
    * Auto-selects the physical strategy by corpus size: at or below
    * `exactLimit` vectors the exact all-pairs join runs (quadratic but
    * cheap, and oracle-exact); above it, candidates come from probe-2
    * IVF cells (√n seeded k-means centroids, each vector lands in its 2
    * nearest cells, pairs must share a cell) and only candidates get the
    * exact cosine verify — pair work drops from n² to ~4·n²/cells with
    * NO unconditioned cross join in the plan. Near-duplicates sit far
    * inside cell interiors relative to the cell diameter, so probe-2
    * recall is high (pinned by SimilaritySpec against brute force).
    */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double,
      exactLimit: Long = 20000L, knownCount: Option[Long] = None): DataFrame = {
    ArrayOps.register(vectors.sparkSession)
    val a = side(vectors, "vec_a", "va", "na")
    val b = side(vectors, "vec_b", "vb", "nb")
    // a pinned exact mode (exactLimit = MaxValue, e.g. the oracle-carrying
    // query entry) must not pay an eager count job for a predetermined
    // branch — the builder stays lazy in that case; pipeline callers that
    // already hold a count pass it via `knownCount` (no second scan)
    lazy val n = knownCount.getOrElse(vectors.count())
    // The exact↔approximate switch changes result SEMANTICS (recall < 1
    // above the limit) — announce it the way Bench announces a failed
    // silver warm-up, so a size-dependent strategy is never silent.
    def announce(strategy: String): Unit =
      System.err.println(s"[similarity] cosineNearDupPairs: $strategy " +
        s"(n=${if (exactLimit == Long.MaxValue) "unconstrained" else n.toString}, " +
        s"exactLimit=$exactLimit)")
    if (exactLimit == Long.MaxValue || n <= exactLimit) {
      announce("exact all-pairs")
      a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          pairCos("va", "vb", "na", "nb").as("cos"))
        .filter(col("cos") >= threshold)
    } else {
      announce("approximate IVF candidates + exact verify (recall < 1)")
      val nCells = math.max(16, math.sqrt(n.toDouble).toInt)
      val cents = kmeansCentroids(vectors, nCells, knownCount = Some(n))
      // assign ONCE; the b side is the same assignment under renamed
      // columns (the scoring pass is the data-sized cost — don't run it
      // twice for a self-join)
      val av = assign(a, "vec_a", "va", "na", cents, probes = 2)
      val bv = av.select(col("vec_a").as("vec_b"), col("va").as("vb"),
        col("na").as("nb"), col("cell_id"))
      av.join(bv, Seq("cell_id")).filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          pairCos("va", "vb", "na", "nb").as("cos"))
        .filter(col("cos") >= threshold)
        .distinct() // a pair sharing both probed cells appears twice
    }
  }

  /** Per-group centroid and dispersion of an embedding column, long-form:
    * one row per (group, dimension) with the mean and variance of that
    * coordinate — the class-prototype / cluster-statistics primitive
    * (quality monitoring of an embedding space, nearest-centroid
    * labeling, drift detection between corpus snapshots).
    *
    * Shape: `posexplode` (dim× row blow-up — a constant factor, like the
    * IVF probe fan-out) then ONE hash aggregate on (group, pos) —
    * map-side combinable, no joins, no window. Long form deliberately:
    * re-assembling arrays would need an order-sensitive collect per
    * group; downstream consumers (nearest-centroid = a dot against the
    * pivoted centroid) can pivot the small result themselves.
    *
    * Determinism: per-coordinate sums go through DECIMAL(27,6) (float →
    * exact DOUBLE → decimal at 6 dp ≈ float's own precision), so the
    * result is independent of row order on either engine — the same
    * convention as the money sums (queriesdef.Oracle). Variance is the
    * E[v²]−mean² form over two decimal sums, computed in DOUBLE after
    * both sums are exact — deterministic, and never negative beyond a
    * last-ulp (clamped at 0).
    */
  def labelCentroids(vectors: DataFrame, groupCol: String = "label"): DataFrame = {
    val v = col("v").cast("double")
    vectors
      .select(col(groupCol), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col(groupCol), col("pos").cast("long").as("pos"))
      .agg(
        count(lit(1)).as("n_vectors"),
        sum(v.cast("decimal(27,6)")).as("__s"),
        sum((v * v).cast("decimal(27,6)")).as("__s2"))
      .select(
        col(groupCol), col("pos"), col("n_vectors"),
        (col("__s").cast("double") / col("n_vectors")).as("centroid"),
        greatest(
          col("__s2").cast("double") / col("n_vectors") -
            (col("__s").cast("double") / col("n_vectors")) *
            (col("__s").cast("double") / col("n_vectors")),
          lit(0.0)).as("variance"))
  }

  /** Semantic decontamination: flag every training vector whose cosine to
    * ANY held-out/eval vector reaches `threshold` — the embedding-space
    * sibling of the n-gram gate ([[graft.text.Curation.decontaminate]]).
    * Exact n-gram overlap misses paraphrases and translations; an
    * embedding match catches what the surface form hides (and is the gate
    * published pipelines run beside the 13-gram rule).
    *
    * Output: one row per train vector — eval-hit count, max cosine
    * (rounded to 9 decimals BEFORE the max, so the per-pair rounding
    * convention makes the argmax engine-exact), contaminated flag.
    *
    * Scale shape: eval suites are MBs against a training corpus of TBs —
    * the eval side is an explicit `broadcast`, so the data-sized pass is
    * one map over train (|eval| dots per row, the codegen'd kernel) plus
    * one map-side-combinable aggregation on vec_id. No train shuffle of
    * the embedding payload beyond its own aggregation; no n² pair space
    * is ever materialized.
    */
  def semanticDecontaminate(train: DataFrame, eval: DataFrame,
      threshold: Double): DataFrame = {
    ArrayOps.register(train.sparkSession)
    val t = side(train, "vec_id", "tv", "nt")
    val e = broadcast(side(eval, "eval_id", "ev", "ne")
      .select(col("ev"), col("ne")))
    t.crossJoin(e)
      .select(col("vec_id"), pairCos("tv", "ev", "nt", "ne").as("cos"))
      .groupBy("vec_id")
      .agg(
        sum(when(col("cos") >= threshold, 1L).otherwise(0L)).as("n_hits"),
        max(col("cos")).as("max_cos"))
      .select(col("vec_id"), col("n_hits"), col("max_cos"),
        (col("n_hits") > 0L).as("contaminated"))
  }
}
