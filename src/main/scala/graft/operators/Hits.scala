package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HITS hubs & authorities (Kleinberg, JACM '99) on a DIRECTED edge list
  * — the second link-centrality family next to [[PageRank]]: PageRank
  * scores global random-walk visitability, HITS separates the two roles
  * a node can play — a good HUB points at good authorities, a good
  * AUTHORITY is pointed at by good hubs. On a curation graph
  * (documents → cited sources, customers → suppliers) the authority
  * score is the "vouched-for" signal and the hub score the
  * "well-curating" signal; the roles are distinct on any asymmetric
  * graph, which is exactly what PageRank cannot see.
  *
  * UNNORMALIZED power iteration with an all-integer contract: h₀ = a₀ = 1
  * for every node, then per round r: a_r(v) = Σ_{u→v} h_{r−1}(u), h_r(u)
  * = Σ_{u→v} a_{r−1}(v) — i.e. both ranks advance simultaneously from
  * the PREVIOUS round (the textbook synchronous variant; the sequential
  * a-then-h variant is one index shift away). Kleinberg's normalization
  * divides by the vector norm — a float; omitting it changes no RANKING
  * (scores scale uniformly per round) and keeps every score an exact
  * BIGINT, so the oracle replays the rounds as plain join-aggregate SQL
  * bit-for-bit. Magnitudes grow like (max degree)^rounds — callers keep
  * `rounds` small (2-3 suffices for ranking studies; overflow needs
  * degree^rounds > 2⁶³, far beyond any bounded-round use here).
  *
  * Scale shape: per round TWO keyed joins of the rank frames against the
  * persisted distinct edge list + hash aggs with map-side partials
  * (identical to [[PageRank]]'s one-join-one-agg-per-round discipline,
  * doubled because HITS carries two vectors); per-round localCheckpoint;
  * node universe = edge endpoints, both sides (after round 1 a pure
  * source holds authority 0 and a pure sink holds hub 0 — both stay in
  * the output with their zeros, the honest reading).
  */
object Hits {

  /** @param edges directed (`srcCol`, `dstCol`) pairs; duplicates are
    *              collapsed (simple-graph semantics, same as PageRank).
    * @return one row per node: (node, hub, auth) after `rounds`
    *         synchronous unnormalized rounds, exact BIGINTs.
    */
  def hubsAndAuthorities(
      edges: DataFrame,
      rounds: Int,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    // lineage-truncated, not persist()ed (the Cluster.connectedComponents
    // lesson): both loop joins per round would otherwise re-analyze the
    // full upstream edge subtree. `nodes` derives from the edge leaf and
    // is checkpointed too — it joins into every round's rank rebuild.
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    var ranks = nodes
      .select(col("node"), lit(1L).as("hub"), lit(1L).as("auth"))
      .localCheckpoint()
    var r = 0
    while (r < rounds) {
      // a_r(v) = Σ_{u→v} h_{r−1}(u): join prior ranks onto edge sources
      val aNext = e
        .join(ranks.select(col("node"), col("hub")), e("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(col("hub")).as("auth"))
      // h_r(u) = Σ_{u→v} a_{r−1}(v): join prior ranks onto edge targets
      val hNext = e
        .join(ranks.select(col("node"), col("auth")), e("dst") === col("node"))
        .groupBy(col("src"))
        .agg(sum(col("auth")).as("hub"))
      ranks = nodes
        .join(hNext.select(col("src").as("node"), col("hub")), Seq("node"), "left")
        .join(aNext.select(col("dst").as("node"), col("auth")), Seq("node"), "left")
        .select(
          col("node"),
          coalesce(col("hub"), lit(0L)).as("hub"),
          coalesce(col("auth"), lit(0L)).as("auth"))
        .localCheckpoint()
      r += 1
    }
    ranks
  }
}
