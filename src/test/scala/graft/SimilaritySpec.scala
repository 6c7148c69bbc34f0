package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine: orthogonal=0, parallel=1, opposite=-1, 45°=√2/2") {
    val pairs = Similarity.cosineNearDupPairs(vecs, threshold = -2.0)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cos")).toMap
    assert(pairs((0L, 1L)) == 0.0)
    assert(pairs((0L, 3L)) == -1.0)
    assert(math.abs(pairs((0L, 2L)) - math.sqrt(2) / 2) < 1e-8)
  }

  test("zero-norm vectors: cosine is 0.0 by convention, no ANSI div-0 abort") {
    val withZero = vecs.union(Seq((9L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding"))
    val pairs = Similarity.cosineNearDupPairs(withZero, threshold = -2.0)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cos")).toMap
    assert(pairs((0L, 9L)) == 0.0) // zero vector against a real one
    // non-zero pairs unaffected
    assert(pairs((0L, 3L)) == -1.0)
  }

  test("brute-force top-k: correct neighbor order, self excluded") {
    val out = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 1L, 3L))
    assert(out.forall(_.getAs[Long]("query_id") == 0L))
  }

  test("IVF recall vs brute force on the fixture embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(q, emb, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // recall@5 report for both probe settings (probes=2 is the default)
    val byProbes = Seq(1, 2).map { p =>
      val ivf = Similarity.ivfTopK(q, emb, k = 5, nCells = 4, probes = p).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      // every IVF hit must be a real vector pair (query != neighbor)
      assert(ivf.forall { case (a, b) => a != b })
      val recall = (bf & ivf).size.toDouble / bf.size
      info(f"IVF recall@5 (nCells=4, probes=$p): $recall%.3f")
      p -> recall
    }.toMap
    assert(byProbes(1) >= 0.2, s"IVF recall unreasonably low: ${byProbes(1)}")
    // recall is monotone in probes: probe-2 candidates ⊇ probe-1
    assert(byProbes(2) >= byProbes(1),
      s"probe-2 recall ${byProbes(2)} < probe-1 recall ${byProbes(1)}")
    // the default must match the documented probes=2 behavior exactly
    val dflt = Similarity.ivfTopK(q, emb, k = 5, nCells = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val p2 = Similarity.ivfTopK(q, emb, k = 5, nCells = 4, probes = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(dflt == p2, "default probes must be 2")
  }

  test("stored IVF index: search ≡ live ivfTopK, scan pruned to probed cells") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val root = java.nio.file.Files.createTempDirectory("ivf-idx").toString + "/i"
    Similarity.writeIvfIndex(emb, nCells = 4, root)
    val stored = Similarity.searchIvfIndex(spark, root, q, k = 5, probes = 2)
    // same centroids (seeded fit on the same corpus) → identical results
    val live = Similarity.ivfTopK(q, emb, k = 5, nCells = 4, probes = 2)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos"))).toSet
    assert(keyed(stored) == keyed(live))
    // the index scan must carry a cell_id partition filter — the whole
    // point of storing the assignment is directory-level pruning
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell_id"),
      s"expected a static cell_id partition filter on the index scan:\n$plan")
  }

  test("appendIvfIndex: append-then-search ≡ full rebuild, batch-only pass") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos"))).toSet
    // deterministic centroids so both builds share the quantizer exactly
    val rootA = java.nio.file.Files.createTempDirectory("ivf-app").toString + "/i"
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 250), nCells = 4,
      rootA, kmeansCells = false)
    Similarity.appendIvfIndex(emb.filter(col("vec_id") >= 250), rootA, "b1")
    val rootB = java.nio.file.Files.createTempDirectory("ivf-full").toString + "/i"
    Similarity.writeIvfIndex(emb, nCells = 4, rootB, kmeansCells = false)
    assert(keyed(Similarity.searchIvfIndex(spark, rootA, q, k = 5))
      == keyed(Similarity.searchIvfIndex(spark, rootB, q, k = 5)))
    // the appended index keeps the pruned-scan property
    val plan = Similarity.searchIvfIndex(spark, rootA, q, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell_id"),
      s"appended index must keep the cell_id partition filter:\n$plan")
  }

  test("appendIvfIndex: retried batch is fenced — double append ≡ single append") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos"))).toSeq.sorted
    val root = java.nio.file.Files.createTempDirectory("ivf-fence").toString + "/i"
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 250), nCells = 4,
      root, kmeansCells = false)
    val batch = emb.filter(col("vec_id") >= 250)
    Similarity.appendIvfIndex(batch, root, "retry-me")
    val once = keyed(Similarity.searchIvfIndex(spark, root, q, k = 5))
    // the retry: same batchId → committed batch wins, nothing double-writes
    Similarity.appendIvfIndex(batch, root, "retry-me")
    val twice = keyed(Similarity.searchIvfIndex(spark, root, q, k = 5))
    assert(twice == once, "a retried append must not duplicate neighbors")
    // row-level proof, not just top-k: the stored corpus has each vec once
    val n = Similarity.ivfDriftMetric(spark, root).collect()
      .map(_.getAs[Long]("n_members")).sum
    assert(n == emb.count(), s"index holds $n members, expected ${emb.count()}")
    // a crashed attempt's staging leftovers are invisible to readers
    val staging = new java.io.File(root + "/batches/.staging-ghost")
    staging.mkdirs()
    assert(keyed(Similarity.searchIvfIndex(spark, root, q, k = 5)) == once)
    // malformed batch ids are refused before any write
    intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(batch, root, "../escape")
    }
  }

  test("IVF maintenance: drift metric + re-centroid over a 5-batch append cycle") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(q, emb, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recall(root: String): Double = {
      val got = Similarity.searchIvfIndex(spark, root, q, k = 5).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      (bf & got).size.toDouble / bf.size
    }
    // index over the first fifth, then 4 appended batches = the full corpus
    val root = java.nio.file.Files.createTempDirectory("ivf-maint").toString + "/i"
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 100), nCells = 4, root)
    for (b <- 1 to 4)
      Similarity.appendIvfIndex(
        emb.filter(col("vec_id") >= b * 100L && col("vec_id") < (b + 1) * 100L),
        root, s"batch-$b")
    // drift metric: one row per non-empty cell, counts cover the corpus,
    // cohesion is a valid mean cosine
    val drift = Similarity.ivfDriftMetric(spark, root).collect()
    val n = emb.count()
    assert(drift.map(_.getAs[Long]("n_members")).sum == n)
    assert(drift.forall(r => math.abs(r.getAs[Double]("mean_cos")) <= 1.0))
    val preRecall = recall(root)
    val preCohesion = drift.map(r =>
      r.getAs[Double]("mean_cos") * r.getAs[Long]("n_members")).sum / n
    // re-centroid compaction: refit over the CURRENT corpus, new root
    val root2 = java.nio.file.Files.createTempDirectory("ivf-maint2").toString + "/i"
    Similarity.recentroidIvfIndex(spark, root, root2, nCells = 4)
    val drift2 = Similarity.ivfDriftMetric(spark, root2).collect()
    assert(drift2.map(_.getAs[Long]("n_members")).sum == n)
    val postCohesion = drift2.map(r =>
      r.getAs[Double]("mean_cos") * r.getAs[Long]("n_members")).sum / n
    val postRecall = recall(root2)
    info(f"5-batch cycle: cohesion $preCohesion%.4f -> $postCohesion%.4f, " +
      f"recall@5 $preRecall%.3f -> $postRecall%.3f")
    // the recall audit must stay green after the full maintenance cycle
    assert(postRecall >= 0.2, s"post-recentroid recall collapsed: $postRecall")
    // refitting centroids on the corpus the stale quantizer only saw a
    // fifth of must not LOSE cohesion (k-means optimizes exactly this)
    assert(postCohesion >= preCohesion - 0.05,
      s"re-centroid lost cohesion: $preCohesion -> $postCohesion")
    // in-place rewrite is refused
    intercept[IllegalArgumentException] {
      Similarity.recentroidIvfIndex(spark, root, root, nCells = 4)
    }
  }

  test("maintainIvfIndex: drift triggers re-centroid, healthy index untouched") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def cluster(dir: Int, idBase: Long, n: Int) = (0 until n).map { i =>
      val v = Array.fill(8)(0.03f * rnd.nextGaussian().toFloat)
      v(dir) += 1.0f
      (idBase + i, v)
    }
    // base corpus: one tight cluster; 5 appended batches: an ORTHOGONAL
    // cluster the frozen quantizer never saw — cohesion collapses
    val base = cluster(0, 0L, 200).toDF("vec_id", "embedding")
    val batches = (0 until 5).map(b => cluster(1, 1000L + b * 40L, 40))
    val root = java.nio.file.Files.createTempDirectory("ivf-pol").toString + "/i"
    Similarity.writeIvfIndex(base, nCells = 4, root)
    for ((batch, b) <- batches.zipWithIndex)
      Similarity.appendIvfIndex(batch.toDF("vec_id", "embedding"),
        root, s"drift-$b")
    // policy: cohesion floor 0.8 — the drifted half sits near cos 0 to
    // every base centroid, so the weighted mean is far below the floor
    val dest = java.nio.file.Files.createTempDirectory("ivf-pol2").toString + "/i"
    val live = Similarity.maintainIvfIndex(spark, root, dest, nCells = 4,
      minMeanCos = 0.8)
    assert(live == dest, "drifted index must trigger the re-centroid")
    // post-compaction: the corpus is intact, cohesion is back above the
    // floor, and a second policy pass declares the new root healthy
    val drift2 = Similarity.ivfDriftMetric(spark, dest).collect()
    val n = drift2.map(_.getAs[Long]("n_members")).sum
    assert(n == 400L, s"compacted index lost rows: $n")
    val cohesion = drift2.map(r =>
      r.getAs[Double]("mean_cos") * r.getAs[Long]("n_members")).sum / n
    assert(cohesion >= 0.8, s"post-compaction cohesion still low: $cohesion")
    val dest2 = java.nio.file.Files.createTempDirectory("ivf-pol3").toString + "/i"
    assert(Similarity.maintainIvfIndex(spark, dest, dest2, nCells = 4,
      minMeanCos = 0.8) == dest, "healthy index must not re-compact")
    // recall audit stays green through the triggered maintenance
    val all = base.unionByName(
      batches.flatten.toDF("vec_id", "embedding"))
    val q = all.filter(col("vec_id") < 5 || col("vec_id") >= 1195)
    val bf = Similarity.bruteForceTopK(q, all, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = Similarity.searchIvfIndex(spark, dest, q, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (bf & got).size.toDouble / bf.size
    info(f"post-trigger recall@5: $recall%.3f")
    assert(recall >= 0.8, s"post-trigger recall collapsed: $recall")
  }

  test("hardNegatives: nearest different-label vectors only") {
    val docs = Seq(
      (0L, Array(1f, 0f), "a"),
      (1L, Array(0.99f, 0.14f), "a"),  // nearest overall, SAME label
      (2L, Array(0.9f, 0.43f), "b"),   // nearest different-label
      (3L, Array(0f, 1f), "b"),
      (4L, Array(-1f, 0f), "c")
    ).toDF("vec_id", "embedding", "label")
    val got = graft.similarity.Similarity
      .hardNegatives(docs.filter(col("vec_id") === 0), docs, k = 2)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L))
    assert(got.forall(_.getAs[String]("neighbor_label") != "a"))
    assert(got.forall(_.getAs[String]("query_label") == "a"))
  }

  test("hardNegativesIvf: recall vs brute force, labels honored") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val bf = graft.similarity.Similarity.hardNegatives(q, emb, k = 5)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val ivf = graft.similarity.Similarity
      .hardNegativesIvf(q, emb, k = 5, nCells = 4, probes = 2)
      .collect()
    // every IVF negative is genuinely different-label
    assert(ivf.forall(r =>
      r.getAs[String]("query_label") != r.getAs[String]("neighbor_label")))
    val ivfSet = ivf
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val recall = (bf & ivfSet).size.toDouble / bf.size
    info(f"hard-negative IVF recall@5 (nCells=4, probes=2): $recall%.3f")
    // the measured envelope on this deterministic fixture is 0.66@5
    // (seeded k-means, fixed corpus) — a floor of 0.6 actually trips on
    // a cell-join/probe/label-predicate regression, where the old 0.2
    // let recall collapse by 2/3 unnoticed (r9 VERDICT). The oracled
    // hard_negative_recall_audit query pins the deterministic-centroid
    // path's exact per-query values on top of this.
    assert(recall >= 0.6, s"hard-negative IVF recall regressed: $recall")
    // the scale property: candidates come from the CELL equi-join, never
    // an all-pairs product (the brute path's CartesianProduct is the
    // thing this variant exists to avoid)
    val plan = graft.similarity.Similarity
      .hardNegativesIvf(q, emb, k = 5, nCells = 4, kmeansCells = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"IVF hard negatives must not plan an all-pairs join:\n$plan")
  }

  test("cosineNearDupPairs honors knownCount without a second scan") {
    val rnd = new scala.util.Random(11)
    val emb = (0L until 50L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    // knownCount drives the branch: with exactLimit=0 the corpus size
    // would force the approximate path, but a supplied count of 0 keeps
    // the exact plan (visible as the all-pairs join in the physical plan)
    val forced = Similarity.cosineNearDupPairs(emb, 0.9, exactLimit = 0L,
      knownCount = Some(0L))
    val plan = forced.queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct") || plan.contains("NestedLoop"),
      s"knownCount<=exactLimit must select the exact all-pairs plan:\n$plan")
    // and results are identical across branches on the same corpus
    val exact = Similarity.cosineNearDupPairs(emb, 0.5)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val viaKnown = Similarity.cosineNearDupPairs(emb, 0.5, knownCount = Some(50L))
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(viaKnown == exact)
  }

  test("near-dup scale path: high recall vs exact, no unconditioned cross join") {
    // synthetic near-dup corpus (the operator's actual use case): 60
    // bases × 5 jittered copies in 16 dims — copies are ≥0.95-cosine to
    // their base, bases are well separated. Deterministic seed.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).flatMap { b =>
      val base = Array.fill(16)(rnd.nextGaussian().toFloat)
      (0 until 5).map { j =>
        val v = base.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
        ((b * 5 + j).toLong, v)
      }
    }
    val emb = rows.toDF("vec_id", "embedding")
    val threshold = 0.95
    val exact = Similarity.cosineNearDupPairs(emb, threshold)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(exact.nonEmpty, "synthetic corpus should contain near-dup pairs")
    // force the candidate path by setting the exact limit below the corpus
    val approxDf = Similarity.cosineNearDupPairs(emb, threshold, exactLimit = 0L)
    // physical plan: the only cross join allowed is the bounded
    // broadcast against the centroid table, never an n×n CartesianProduct
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"scale path must not plan an unconditioned n×n cross join:\n$plan")
    val approx = approxDf
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    // no false positives: the verify step computes exact cosine
    assert(approx.subsetOf(exact), s"false positives: ${approx -- exact}")
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"near-dup candidate recall too low: $recall")
  }

  test("labelCentroids: hand-checked means/variances, long form") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(3.0f, 0.0f), 0),
      (3L, Seq(5.0f, 2.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroids(d).collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.size == 4) // 2 labels × 2 dims
    assert(out((0, 0L)) == ((2L, 2.0, 1.0)))  // mean(1,3)=2, var=1
    assert(out((0, 1L)) == ((2L, 0.0, 0.0)))
    assert(out((1, 0L)) == ((1L, 5.0, 0.0)))  // singleton: var clamps at 0
    assert(out((1, 1L)) == ((1L, 2.0, 0.0)))
  }

  test("semanticDecontaminate: hand-checked hits, eval side broadcast") {
    import spark.implicits._
    val train = Seq(
      (1L, Seq(1.0f, 0.0f)),   // cos 1.0 to e1, 0 to e2 → 1 hit
      (2L, Seq(1.0f, 1.0f)),   // cos √2/2 ≈ .707 to both → 2 hits
      (3L, Seq(-1.0f, 0.0f)),  // cos −1 and 0 → clean
      (4L, Seq(0.0f, 0.0f))    // zero vector: cos 0.0 by convention → clean
    ).toDF("vec_id", "embedding")
    val eval = Seq(
      (100L, Seq(1.0f, 0.0f)), (101L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(train, eval, threshold = 0.5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"eval side not broadcast:\n$plan")
    val m = out.collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(m(1L) == ((1L, 1.0, true)))
    assert(m(2L)._1 == 2L && m(2L)._3 && math.abs(m(2L)._2 - 0.707106781) < 1e-9)
    assert(m(3L) == ((0L, 0.0, false)))
    assert(m(4L) == ((0L, 0.0, false)))
    assert(m.size == 4) // every train vector reported, clean ones included
  }
}
