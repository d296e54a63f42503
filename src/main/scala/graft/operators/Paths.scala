package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS: exact hop distance from a SEED SET over an
  * undirected graph — the "distance from trusted pages" corpus-quality
  * prior (the seed-proximity signal behind curated-crawl ranking, the
  * same family as the harmonic-centrality prior [[PageRank]] covers;
  * UCINET/web-graph literature calls it k-step reach). Near the seeds =
  * probably curated; far or unreachable = crawl frontier noise.
  *
  * Frontier-based: each round expands only the nodes settled LAST round
  * (not the whole settled table), so total work is Σ_rounds
  * |frontier|·avg-degree = O(edges) across the whole run — the textbook
  * parallel BFS work bound. Per round: ONE join of the frontier against
  * the persisted bidirectional edge list keyed by src, one min-collapse,
  * one left-anti against the settled table. Distances are exact hop
  * counts (longs), so the operator is bit-oracleable — no floats
  * anywhere.
  *
  * Scale design (100 TB posture):
  *   - the edge list symmetrizes via ONE explode over the pair scan (the
  *     [[Cluster.connectedComponents]] single-scan trick) and persists
  *     MEMORY_AND_DISK; every round reuses the materialized partitioning;
  *   - the settled table grows monotonically to ≤ |V| rows of two longs
  *     and is `localCheckpoint`ed per round — the mandatory lineage
  *     truncation for iterative DataFrame jobs;
  *   - rounds are bounded by the seed-set eccentricity (web graphs:
  *     tens), each a constant number of shuffles; convergence is frontier
  *     exhaustion — an exact test, not a heuristic;
  *   - unreachable nodes surface with NULL distance (they are the
  *     signal: nothing vouches for them).
  */
object Paths {

  /** Hop distance from `seeds` (column `seedCol`) over the undirected
    * pair list `edges` (columns `aCol`, `bCol`).
    *
    * @return one row per graph node (plus any seed not in the graph):
    *         (node, dist) — dist NULL when unreachable from every seed.
    */
  def seedDistance(
      edges: DataFrame,
      seeds: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      seedCol: String = "node",
      maxIters: Int = 30
  ): DataFrame = {
    val bidir = edges
      .select(
        explode(
          array(
            struct(col(aCol).as("src"), col(bCol).as("dst")),
            struct(col(bCol).as("src"), col(aCol).as("dst"))
          )).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      // lineage-truncated, not persist()ed (the Cluster.connectedComponents
      // lesson): every BFS round joins the frontier against this frame and
      // would re-analyze the full upstream pair-mining plan each time
      .localCheckpoint(true)
    // node universe from the SAME checkpointed edge list (the x46
    // node-set-from-cache lesson: never rescan the expensive pair miner)
    val nodes = bidir.select(col("src").as("node")).distinct()

    // LAZY checkpoints throughout the BFS (r15): each round's `count()`
    // is the materializing action, so an eager checkpoint just split the
    // same work into two driver jobs. `settled` accumulates as a plain
    // union of already-checkpointed frontier frames — a union of
    // LogicalRDD leaves is constant-cost to plan (rounds are bounded by
    // the seed eccentricity) and costs no job at all, where the previous
    // per-round re-checkpoint of the whole settled set paid one job AND
    // one full rewrite of the accumulated blocks per round. 3 jobs/round
    // → 1 job/round, same frames, same convergence test.
    var settled = seeds
      .select(col(seedCol).as("node"))
      .distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(false)
    var frontier = settled
    var rounds = 0
    var frontierSize = frontier.count()
    while (frontierSize > 0 && rounds < maxIters) {
      val next = frontier
        .join(bidir, frontier("node") === bidir("src"))
        .select(col("dst").as("node"), (col("dist") + 1L).as("dist"))
        .groupBy("node")
        .agg(min("dist").as("dist"))
        .join(settled.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(false)
      frontierSize = next.count()
      if (frontierSize > 0) {
        settled = settled.unionAll(next)
        frontier = next
      }
      rounds += 1
    }
    nodes
      .join(settled, Seq("node"), "full_outer")
      .select(col("node"), col("dist"))
  }
}
