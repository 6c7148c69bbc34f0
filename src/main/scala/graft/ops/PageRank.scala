package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the iterative-join family
  * (label propagation's weighted cousin; the engine's `Clusters` covers
  * the unweighted reachability case). Centrality over the product
  * co-occurrence graph is the classic "which items anchor the
  * assortment" retail analytic.
  *
  * Each iteration is ONE equi-join (ranks ⋈ edges on src) + ONE hash
  * aggregate (by dst) — the canonical distributed shape: edge table
  * shuffles once per iteration on src, contributions combine map-side.
  * At 100 TB graph scale the edge table is the big side — persist it
  * partitioned by src so every iteration reuses the layout, and
  * checkpoint ranks every few iterations to cut lineage; here iterations
  * are fixed and small, so lineage stays bounded by construction.
  *
  * Determinism: per-edge contributions `rank/deg` are rounded into
  * DECIMAL(28,15) before the per-dst SUM (exact, combine-order
  * independent), and the damped update closes in double with one fixed
  * association, re-quantized to 15 dp each iteration — both engines see
  * bit-identical ranks at every step, so the result is oracle-exact with
  * no tolerance.
  *
  * Dangling mass: nodes appear in `edges` both ways (the co-occurrence
  * graph is symmetric), so every node has out-degree ≥ 1 and no mass
  * leaks; the (1−d)/N teleport keeps the total bounded regardless.
  */
object PageRank {

  /** `edges`: directed (src, dst) pairs. Returns (node, rank) after
    * `iterations` damped rounds from the uniform start.
    */
  def run(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"run: iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"run: damping $damping outside (0,1)")
    // Materialize the edge list ONCE (eager localCheckpoint = lineage
    // truncation + executor-resident blocks): every iteration references
    // edges, and nodes/deg derive from it too — without this, an edge
    // list built from an expensive upstream lineage (e.g. basket-pair
    // mining) re-executes that lineage per reference, turning 3
    // iterations into ~10 full recomputes (measured 37s → ~4s on the
    // co-occurrence graph at sf0.1). Blocks are freed when the returned
    // frame is garbage-collected.
    // Partition the persisted frames by their JOIN keys and checkpoint
    // with AQE disabled so the LogicalRDD captures the concrete
    // HashPartitioning (under AQE the captured partitioning is unknown
    // and every iteration re-exchanges all three inputs — measured 36
    // Spark jobs for 3 iterations at sf0.1). With src-partitioned edges
    // and degrees and node-partitioned ranks, each iteration plans
    // exactly ONE exchange — the per-dst contribution aggregate — which
    // is the inherent shuffle of the algorithm (scaladoc: "persist it
    // partitioned by src so every iteration reuses the layout").
    val spark = edges.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqePrev = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    val (e, nodes, deg) =
      try {
        val e0 = edges.repartition(col("src")).localCheckpoint(true)
        val n0 = e0.select(col("src").as("node"))
          .union(e0.select(col("dst"))).distinct()
          .localCheckpoint(true)
        val d0 = e0.groupBy("src").agg(count(lit(1)).as("deg"))
          .localCheckpoint(true)
        (e0, n0, d0)
      } finally spark.conf.set(aqeKey, aqePrev)
    // |nodes| is a control-sized scalar (graph order, not data rows):
    // collect it ONCE and embed as a literal. The broadcast-joined
    // 1-row aggregate it replaces was re-broadcast in init + every
    // iteration (4 broadcast exchanges + 4 count jobs for 3 iterations);
    // the arithmetic is unchanged — same exact long, same division.
    val nNodes = nodes.count().toDouble
    val init = nodes
      .select(col("node"), round(lit(1.0) / lit(nNodes), 15).as("rank"))
    (1 to iterations).foldLeft(init) { (ranks, _) =>
      val contrib = ranks
        .join(deg, ranks("node") === deg("src"))
        .join(e, Seq("src"))
        .select(col("dst").as("node"),
          round(col("rank") / col("deg").cast("double"), 15)
            .cast("decimal(28,15)").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("in_mass"))
      nodes.join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          round(lit(1.0 - damping) / lit(nNodes)
            + lit(damping) * coalesce(col("in_mass").cast("double"), lit(0.0)),
            15).as("rank"))
    }
  }
}
