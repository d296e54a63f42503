package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over an embedding column (BASELINE.json north star).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     The query side is broadcast (queries ≪ corpus in every retrieval
  *     workload), so the corpus is scanned exactly once with no shuffle of
  *     vectors; only (query_id, corpus_id, score) triples reach the top-k
  *     shuffle.
  *   - [[lshTopK]]: sign-random-projection LSH buckets as the scale path —
  *     each query only scores the corpus vectors in its bucket(s).
  *
  * Scoring is [[graft.functions.CosineSimilarity]] — a codegen'd Catalyst
  * expression, not a UDF.
  */
object Similarity {

  /** Exact top-k: score all pairs, rank per query.
    * Deterministic tie-break: (score desc, corpus id asc).
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    // spread: corpus scans are byte-sized by Spark but pair scoring is
    // CPU-bound — parallelize before the crossJoin (see Dedup.spread)
    val c = Dedup.spread(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")))
    val scored = c
      .join(broadcast(q))
      .withColumn("score", round(GraftFunctions.cosineSim(col("q_vec"), col("c_vec")), 6))
    rankTopK(scored, k)
  }

  /** Reduce scored (query_id, neighbor_id, score) pairs to per-query top-k
    * via the TopKByScore TypedImperativeAggregate: map-side partial top-k
    * means the exchange carries ≤ k rows per (partition, query) instead of
    * the full |queries|×|corpus| scored set that a rank-window would
    * shuffle. Ties broken (score desc, neighbor_id asc), identical to the
    * row_number formulation.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(GraftFunctions.topKByScore(col("score"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(
        col("query_id"),
        col("t.neighbor_id").as("neighbor_id"),
        col("t.score").as("score"),
        (col("pos") + 1).cast("int").as("rank")
      )

  /** Sign-random-projection bucket id: `numPlanes` deterministic
    * pseudo-random hyperplanes; bit p of the bucket = sign of dot(v, h_p).
    * Plane components are XXH64-derived and mapped to [-1, 1] — seed-stable
    * across runs and executors, no RNG state to ship.
    *
    * Single-table convenience over [[graft.functions.RpBuckets]], the
    * codegen'd expression that computes the dim × planes loop inside
    * whole-stage-generated Java (the earlier higher-order-builtin
    * formulation allocated 2 arrays per plane per row and cost ~10× more).
    */
  def rpBucket(vec: Column, numPlanes: Int, seed: Int = 42): Column =
    element_at(GraftFunctions.rpBuckets(vec, 1, numPlanes, seed), 1)

  /** Approximate top-k: queries only score corpus vectors whose bucket
    * matches. Recall is tunable via numPlanes (fewer planes → bigger
    * buckets → higher recall, more compute). Multi-probe (flipping one bit)
    * is the standard recall booster; `probeBits` > 0 enables it.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      numPlanes: Int = 8,
      probeBits: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val c = Dedup
      .spread(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")))
      .withColumn("bucket", rpBucket(col("c_vec"), numPlanes))
    // query probes: its own bucket plus each single-bit flip up to probeBits
    val probes: Column = {
      val base = rpBucket(col(vecCol), numPlanes)
      val flips = (0 until (if (probeBits > 0) numPlanes else 0)).map(b =>
        base.bitwiseXOR(lit(1 << b)))
      array((base +: flips).map(_.cast("int")): _*)
    }
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("q_vec"),
      explode(probes).as("bucket")
    )
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .withColumn("score", round(GraftFunctions.cosineSim(col("q_vec"), col("c_vec")), 6))
    // multi-probe can score the same pair via several buckets — dedup first
    rankTopK(scored.select(col("query_id"), col("neighbor_id"), col("score")).distinct(), k)
  }
}
