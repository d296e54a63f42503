package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank in EXACT INTEGER arithmetic (Page, Brin,
  * Motwani, Winograd 1998; the integer formulation follows the
  * fixed-point-arithmetic practice of large-scale web-graph systems).
  *
  * Why integer: floating-point PageRank is order-sensitive — parallel
  * summation re-association drifts the low bits, so two runs (or two
  * engines) disagree and the result can't be exactly oracled or exactly
  * reproduced. Working in integer "rank units" (a fixed global scale,
  * default 1e12 units of total mass) makes every step — share division,
  * damping, teleport — a truncating integer op: associative, commutative,
  * partitioning-invariant, bit-identical across engines. The truncation
  * error is bounded by 1 unit per edge per iteration (≪ 1e-9 of mass),
  * irrelevant for ranking, and identically reproduced everywhere.
  *
  * Training-data relevance: graph centrality over the page/link (or
  * doc/citation) graph is a standard corpus-quality prior (e.g. harmonic
  * centrality shipped with Common Crawl's host-level ranking); a
  * deterministic integer variant makes the score auditable.
  *
  * Scale design (100 TB posture):
  *   - Each iteration is ONE join of the rank table against the
  *     (src, dst, outdeg) edge list keyed by src and ONE aggregation
  *     keyed by dst — the canonical distributed PageRank shape. No
  *     driver-side state beyond the scalar node count.
  *   - Edges are augmented with outdeg once and persisted
  *     (MEMORY_AND_DISK — spills, not OOMs); every iteration reuses the
  *     materialized edge partitioning.
  *   - Rank frames are `localCheckpoint`ed per round — mandatory lineage
  *     truncation for iterative DataFrame jobs (same discipline as
  *     [[Cluster.connectedComponents]]).
  *   - Dangling nodes (no out-edges) receive rank but their mass
  *     evaporates; pass a symmetrized edge list (both directions) when
  *     mass conservation matters — an undirected graph has no dangling
  *     nodes by construction.
  */
object PageRank {

  /** Integer PageRank over the directed edge list `edges` (columns
    * `srcCol`, `dstCol`; duplicates collapsed).
    *
    * r_0(v)   = SCALE div N
    * r_k+1(v) = TELE + (85 * Σ_{u→v} (r_k(u) div outdeg(u))) div 100
    * TELE     = (15 * (SCALE div N)) div 100
    *
    * All ops are truncating long division/multiplication on nonnegative
    * values — deterministic and engine-portable (SQL `x // y` / Spark
    * `div` agree on nonnegative longs).
    *
    * @return one row per node: (node_id, rank_units long)
    */
  def integerPageRank(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iters: Int = 3,
      scaleUnits: Long = 1000000000000L
  ): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edgesDeg = e
      .join(outdeg, "src")
      // lineage-truncated, not persist()ed: persist caches data but keeps
      // the plan, so every rank round would re-analyze the full upstream
      // edge subtree (the Cluster.connectedComponents lesson — that
      // re-planning, not generated code, was the x14 JIT residual).
      // LAZY (r15): `nodes.count()` below is the first action and walks
      // through this frame, so it materializes both checkpoints in ONE
      // job — an eager checkpoint here paid a separate job for the same
      // blocks. Plan truncation is identical either way (localCheckpoint
      // swaps in the LogicalRDD leaf immediately).
      .localCheckpoint(false)
    // derive the node set from the CHECKPOINTED edge list (one pass over
    // the leaf), not from `e` — the raw edge subtree may embed an
    // expensive upstream join that would otherwise evaluate a second time
    val nodes = edgesDeg
      .select(explode(array(col("src"), col("dst"))).as("node_id"))
      .distinct()
      .localCheckpoint(false)

    val n = nodes.count()
    require(n > 0, "integerPageRank: empty graph")
    val base = scaleUnits / n
    val tele = (15L * base) / 100L

    var ranks = nodes.withColumn("rank_units", lit(base))
    var i = 0
    while (i < iters) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("node_id", "src"), "src")
        .select(col("dst").as("node_id"), expr("rank_units div outdeg").as("share"))
        .groupBy("node_id")
        .agg(sum(col("share")).as("incoming"))
      ranks = nodes
        .join(contrib, Seq("node_id"), "left")
        .select(
          col("node_id"),
          (lit(tele) + expr("(85 * coalesce(incoming, 0L)) div 100")).as("rank_units")
        )
        // LAZY (r15): each round's rank frame has exactly ONE downstream
        // reference (the next round's contrib join, or the final action),
        // so no concurrent stage can double-compute it — the caller's one
        // action materializes every round sequentially through the
        // shuffle dependencies, where the eager form paid one extra
        // driver job per round. Lineage is still cut per round (the
        // LogicalRDD swap is immediate), so planning cost stays constant
        // in the iteration count.
        .localCheckpoint(false)
      i += 1
    }
    ranks
  }
}
