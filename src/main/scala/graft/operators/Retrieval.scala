package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.GraftFunctions

/** Sparse lexical retrieval — BM25 top-k (Robertson et al., TREC-3): the
  * inverted-index complement of the dense ANN family (x09-x13, x91): a
  * training-data pipeline retrieves with BOTH (hard-negative mining,
  * decontamination sweeps, targeted corpus slicing), and the lexical side
  * is the one that scales without embedding every document first.
  *
  * EXACT-INTEGER contract (the x17/x70 discipline — a gate that hashes
  * rendered values must see no float formatting): k1 and b arrive in
  * MILLI units (1200, 750 = the standard 1.2/0.75), and scoring is a
  * fixed sequence of BIGINT operations with floor division at exactly
  * four named points, each replayable by any SQL engine:
  *
  *   lf_ppm(d)    = (1000−bM)·1000 + bM·(len_d·N·1000 div totLen)
  *                  — the length factor (1−b+b·len/avglen)·10⁶; avglen is
  *                  the RATIONAL totLen/N, never rounded on its own
  *   tf_c         = min(tf, 4000) — the saturation clamp that buys the
  *                  headroom below; at tf = 4000 the saturated factor is
  *                  already within 0.03% of its k1+1 asymptote, so the
  *                  clamp is semantically a no-op for real documents
  *   denom_u(t,d) = tf_c·10⁶ + (k1M·lf_ppm div 1000)
  *                  — BM25's denominator ·10⁶
  *   norm_ppm     = tf_c·(1000+k1M)·10¹² div (1000·denom_u)
  *                  — the saturated-tf factor ·10⁶
  *   idf_ppm(t)   = (N−df)·10⁶ div (df+1)
  *                  — a RATIONAL idf surrogate, monotone-decreasing in df
  *                  like the log form; ln((N−df+0.5)/(df+0.5)+1)·10⁶ is
  *                  the named float swap-in (deliberately avoided: two
  *                  engines' `ln` may differ in the last ulp, and a floor
  *                  at ppm scale can flip on that ulp)
  *   score_ppm    = Σ_t idf_ppm·(norm_ppm div 1000) div 1000
  *                  (distinct query terms — BM25 treats the query as a
  *                  term SET; the two-stage division keeps the product in
  *                  BIGINT range at corpus scale)
  *
  * Overflow headroom with the defaults: norm_ppm's numerator
  * tf_c·2200·10¹² ≤ 8.8·10¹⁸ < 2⁶³; contrib's idf_ppm·norm_milli ≤
  * (N·10⁶)·2200 keeps N ≲ 4·10⁹ docs; lf_ppm's len·N·1000 holds to
  * len·N ≤ 9·10¹⁵. All far beyond any real shard.
  *
  * 100 TB shape: postings (term, doc, tf, len) are ONE token-keyed
  * exchange with map-side partial counts; df is a vocabulary-bounded
  * re-aggregation of the postings (no second corpus scan); N/totLen are
  * two driver scalars (the bounded-scalar contract); the query side —
  * queries ≪ corpus, the x09 precondition — is BROADCAST onto the
  * postings so the corpus never reshuffles for the probe; per-query
  * reduction is the TopKByLongScore partial top-k — integer-exact 64-bit
  * ranking, because score_ppm is a SUM of per-term contribs (each near
  * 8.8·10¹⁵) and a many-term query can push the sum past 2⁵³, where a
  * double-ranked top-k would collapse ties the oracle's BIGINT ORDER BY
  * still distinguishes — ≤ k rows per partition per query through the
  * final exchange.
  */
object Retrieval {

  /** Top-k BM25 matches per query. `queries` carries (qIdCol,
    * qTermsCol: array<string>); duplicate terms are collapsed (term-set
    * semantics). Output: (query_id, doc id, score_ppm, rank), ties
    * (score desc, doc asc).
    */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      k1Milli: Long = 1200L,
      bMilli: Long = 750L,
      idCol: String = "doc_id",
      textCol: String = "text",
      qIdCol: String = "query_id",
      qTermsCol: String = "terms"
  ): DataFrame =
    bm25TopKFromPostings(
      postingsOf(docs, idCol, textCol).persist(StorageLevel.MEMORY_AND_DISK),
      queries, k, k1Milli, bMilli, idCol, qIdCol, qTermsCol)

  /** The postings frame (term, id, len, tf) of a corpus — ONE token-keyed
    * exchange with map-side partial counts. Exposed separately so the
    * streaming index maintainer ([[graft.streaming.RetrievalStream]]) can
    * build per-batch delta postings and fold them into state, then score
    * through the SAME [[bm25TopKFromPostings]] the batch path uses —
    * stream ≡ batch by shared code, not by parallel reimplementation.
    */
  def postingsOf(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame =
    Dedup
      .spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col(idCol), size(col("toks")).as("len"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col(idCol), col("len"))
      .agg(count(lit(1)).as("tf"))

  /** BM25 top-k over a PRE-BUILT postings frame — the scoring half of
    * [[bm25TopK]] (same exact-integer contract; df, N, totLen are derived
    * from the postings, never stored redundantly where they could drift
    * from it). The caller owns the postings' persistence.
    */
  def bm25TopKFromPostings(
      postings: DataFrame,
      queries: DataFrame,
      k: Int,
      k1Milli: Long = 1200L,
      bMilli: Long = 750L,
      idCol: String = "doc_id",
      qIdCol: String = "query_id",
      qTermsCol: String = "terms"
  ): DataFrame = {
    require(k >= 1, "k must be positive")
    require(k1Milli >= 0 && bMilli >= 0 && bMilli <= 1000,
      s"k1Milli=$k1Milli bMilli=$bMilli out of contract range")
    // the integer top-k aggregate is a session temp function; registration
    // is idempotent (createOrReplaceTempFunction), so self-registering here
    // keeps every caller — batch query, streaming maintainer, spec — from
    // needing to know the scorer's implementation detail
    GraftFunctions.register(postings.sparkSession)
    // two bounded driver scalars off the postings (not a second corpus scan)
    val totals = postings
      .groupBy(col(idCol))
      .agg(first(col("len")).as("len"))
      .agg(count(lit(1)), sum(col("len")))
      .head()
    val n = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    val totLen = math.max(if (totals.isNullAt(1)) 0L else totals.getLong(1), 1L)
    val df_ = postings
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val qTerms = queries
      .select(col(qIdCol), explode(array_distinct(col(qTermsCol))).as("term"))
    val scored = postings
      .join(broadcast(qTerms), Seq("term"))
      .join(df_, Seq("term")) // vocabulary-bounded; matched terms only
      .withColumn(
        "lf_ppm",
        lit((1000L - bMilli) * 1000L) +
          lit(bMilli) * expr(s"len * ${n}L * 1000L div ${totLen}L"))
      .withColumn("tf_c", least(col("tf"), lit(4000L)))
      .withColumn(
        "denom_u",
        col("tf_c") * lit(1000000L) + expr(s"${k1Milli}L * lf_ppm div 1000L"))
      .withColumn(
        "norm_ppm",
        expr(s"tf_c * ${1000L + k1Milli}L * 1000000000000L div (1000L * denom_u)"))
      .withColumn("idf_ppm", expr(s"(${n}L - df) * 1000000L div (df + 1L)"))
      .withColumn("contrib", expr("idf_ppm * (norm_ppm div 1000L) div 1000L"))
      .groupBy(col(qIdCol), col(idCol))
      .agg(sum(col("contrib")).as("score_ppm"))
    // Rank on the BIGINT score directly (TopKByLongScore): each CONTRIB is
    // bounded near 8.8e15, but score_ppm is a SUM over a query's distinct
    // matched terms, so a many-term query at large N can carry the sum past
    // 2^53 — where a double detour would collapse exact ties that the
    // oracle's BIGINT ORDER BY still distinguishes. Integer-exact top-k
    // keeps map-side partial aggregation AND the oracle's tie order at any
    // term count.
    scored
      .groupBy(col(qIdCol))
      .agg(
        GraftFunctions
          .topKByLongScore(col("score_ppm"), col(idCol), k)
          .as("top"))
      .select(col(qIdCol), posexplode(col("top")).as(Seq("pos", "t")))
      .select(
        col(qIdCol),
        col("t.neighbor_id").as(idCol),
        col("t.score").as("score_ppm"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
