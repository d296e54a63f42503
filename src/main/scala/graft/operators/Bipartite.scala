package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One-mode projection of a bipartite graph — co-occurrence mining, the
  * collaborative-signal verb (customers sharing parts, documents sharing
  * entities, users sharing sessions): project (left, right) incidence
  * onto weighted left-left pairs, weight = number of shared right
  * neighbors.
  *
  * The scale trap is the same one the x06 inverted index dodges: a HUB
  * right-node of degree d mines d²/2 pairs — one viral item visited by a
  * million users is a 5·10¹¹-pair bucket through the naive self-join.
  * The projection is therefore computed over right nodes with degree ≤
  * `maxDegree` only (the df-prune discipline): the result is the EXACT
  * projection of the capped subgraph, and the trade is principled — a
  * right neighbor shared by everyone carries no collaborative signal
  * (the inverse-frequency argument behind idf and stop-shingles), so
  * capping removes the quadratic mass that contributes the least
  * information. Candidate volume is bounded by Σ_{deg ≤ maxDegree} deg²
  * ≤ maxDegree · |edges|, linear in the data for a fixed cap.
  *
  * Plan shape: one distinct on the incidence list, one degree hash-agg,
  * a broadcast-anti hub drop (hub set ≤ |edges|/maxDegree keys — the
  * ≥maxDegree-fold compression argument from the x06 prune), one
  * right-keyed self-join, one pair hash-agg with map-side partials.
  * `minShared` prunes the long weight-1 tail before it leaves the
  * aggregation.
  */
object Bipartite {

  def coOccurrencePairs(
      edges: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDegree: Int = 1000,
      minShared: Long = 1L
  ): DataFrame = {
    require(maxDegree >= 1, "maxDegree must be positive")
    val e = edges
      .select(col(leftCol).as("l"), col(rightCol).as("r"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hubs = e
      .groupBy(col("r"))
      .agg(count(lit(1)).as("deg"))
      .where(col("deg") > maxDegree)
      .select(col("r"))
    val kept = e.join(broadcast(hubs), Seq("r"), "left_anti")
    val out = kept
      .select(col("r"), col("l").as("a_id"))
      .join(kept.select(col("r"), col("l").as("b_id")), Seq("r"))
      .where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
    out
  }
}
