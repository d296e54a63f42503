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

  /** Approximate top-k via multi-table sign-RP LSH (OR-amplification, the
    * standard E2LSH scheme): `tables` independent hash tables of
    * `bitsPerTable` hyperplanes each; a corpus vector is a candidate for a
    * query iff they share a bucket in AT LEAST one table. Candidates are
    * scored with the exact codegen'd cosine, so precision is exact and only
    * recall is probabilistic: a neighbor at angle θ is missed with
    * probability (1−(1−θ/π)^b)^L — at cos≈0.5 the defaults (b=4, L=16)
    * miss ≈4% (SimilaritySpec pins a ≥0.8 recall floor on real vectors).
    *
    * Scale: grow `bitsPerTable` with the corpus so expected bucket size
    * stays bounded (candidates/query ≈ L·n/2^b — linear in n for fixed
    * bucket size, vs n per query for brute force); grow `tables` to push
    * recall. All L buckets per vector come from ONE RpBuckets evaluation.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      tables: Int = 16,
      bitsPerTable: Int = 4,
      seed: Int = 42,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val c = Dedup
      .spread(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")))
      .select(
        col("neighbor_id"),
        col("c_vec"),
        posexplode(GraftFunctions.rpBuckets(col("c_vec"), tables, bitsPerTable, seed))
          .as(Seq("table_id", "bucket"))
      )
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("q_vec"),
      posexplode(GraftFunctions.rpBuckets(col(vecCol), tables, bitsPerTable, seed))
        .as(Seq("table_id", "bucket"))
    )
    val scored = c
      .join(broadcast(q), Seq("table_id", "bucket"))
      .withColumn("score", round(GraftFunctions.cosineSim(col("q_vec"), col("c_vec")), 6))
    // a pair colliding in several tables scores identically each time —
    // dedup before the top-k so duplicates can't occupy multiple ranks
    rankTopK(scored.select(col("query_id"), col("neighbor_id"), col("score")).distinct(), k)
  }

  /** IVF coarse quantizer: `nlist` centroids trained with `iters` rounds of
    * distributed Lloyd k-means. Everything driver-side is bounded by
    * nlist×dim (the quantizer, NOT data-scale state — same contract as the
    * expiry policy's calendar-bounded collect):
    *   - init: the `nlist` corpus vectors with the smallest
    *     `xxhash64(id, seed)` — deterministic, seed-stable, one top-k scan;
    *   - assign: map-only [[graft.functions.NearestCentroids]] (take=1) —
    *     no shuffle of vectors, the quantizer rides inside the expression;
    *   - update: per-list elementwise mean via the
    *     [[graft.functions.VectorAvg]] TypedImperativeAggregate — whole
    *     vectors stay in the map task and ONE (count, sums[dim]) pair per
    *     (list × partition) ships through the exchange, then a ≤ nlist-row
    *     collect. (The posexplode + groupBy(list, pos) formulation this
    *     replaced shuffled dim × corpus rows per round — exactly the
    *     explosion x26's centroids were built to avoid.) Empty lists keep
    *     their previous centroid.
    */
  def ivfCentroids(
      corpus: DataFrame,
      nlist: Int,
      iters: Int = 2,
      seed: Int = 42,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Array[Array[Double]] = {
    require(nlist >= 1, "need at least one list")
    val init: Array[Array[Double]] = corpus
      .select(col(vecCol).cast("array<double>").as("v"), xxhash64(col(idCol), lit(seed)).as("h"))
      .orderBy(col("h"))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    var centroids = init
    var it = 0
    while (it < iters) {
      val cSeq = centroids.map(_.toSeq).toSeq
      val means = corpus
        .select(
          element_at(GraftFunctions.nearestCentroids(col(vecCol), cSeq, 1), 1).as("list_id"),
          col(vecCol).as("v")
        )
        .groupBy(col("list_id"))
        .agg(GraftFunctions.vectorAvg(col("v")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0)) = r.getSeq[Double](1).toArray
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** Approximate top-k via IVF-Flat: train a coarse quantizer
    * ([[ivfCentroids]]), assign each corpus vector to its nearest
    * centroid's inverted list (map-only), then score each query ONLY
    * against the `nprobe` lists nearest to it. Candidates per query ≈
    * (nprobe/nlist)·n, vs n for brute force; unlike the LSH path no
    * `distinct` is needed — lists partition the corpus, so a pair can
    * collide at most once.
    *
    * Scale: the corpus-side assignment is one map-only pass (quantizer
    * inside the expression, no shuffle); the probe join broadcasts the
    * exploded query side; grow `nlist` ∝ corpus size to bound list length
    * (the classic IVF √n rule) and `nprobe` to push recall.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2,
      seed: Int = 42,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "nprobe must be in [1, nlist]")
    val cSeq = ivfCentroids(corpus, nlist, iters, seed, idCol, vecCol).map(_.toSeq).toSeq
    val c = Dedup
      .spread(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")))
      .withColumn(
        "list_id",
        element_at(GraftFunctions.nearestCentroids(col("c_vec"), cSeq, 1), 1)
      )
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("q_vec"),
      explode(GraftFunctions.nearestCentroids(col(vecCol), cSeq, nprobe)).as("list_id")
    )
    val scored = c
      .join(broadcast(q), Seq("list_id"))
      .withColumn("score", round(GraftFunctions.cosineSim(col("q_vec"), col("c_vec")), 6))
    rankTopK(scored.select(col("query_id"), col("neighbor_id"), col("score")), k)
  }
}
