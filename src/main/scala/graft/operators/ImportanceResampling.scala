package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data Selection via Importance Resampling (DSIR) — hashed-n-gram
  * importance weighting of a raw corpus toward a small target corpus
  * (Xie et al., "Data Selection via Importance Resampling", NeurIPS
  * 2023). The pipeline verb: given a large RAW pool and a small TARGET
  * exemplar set (the distribution you want more of), score every raw
  * document by how target-like its hashed-token distribution is and
  * keep the top slice.
  *
  * Everything is exact integer arithmetic so the driver's DuckDB oracle
  * hash-matches with no rounding convention:
  *
  *   - features are hashed token buckets: `bucket(tok) = hex4(md5(tok))
  *     mod nBuckets` — the repo's md5-bucket convention
  *     ([[Sampling.hashBucket]]) reduced mod a small feature width, the
  *     paper's hashed n-gram generalization with n = 1;
  *   - per-bucket importance weight `w_b = ((t_b + 1) * scale) div
  *     (r_b + 1)` — an add-one-smoothed target/raw occurrence-count
  *     likelihood ratio in fixed-point `scale` units. The paper works in
  *     log space and samples with Gumbel noise; the deterministic
  *     fixed-point ratio keeps the same ordering signal while making
  *     every value a BIGINT both engines compute identically (the x12
  *     integer-ppm rule applied to importance weights);
  *   - document score = Σ over token OCCURRENCES of `w_bucket(tok)` —
  *     occurrence-weighted, so a doc that repeats target-heavy vocabulary
  *     scores higher than one that mentions it once.
  *
  * Scale posture (100 TB): one map-side-partial aggregation over
  * `nBuckets` keys builds BOTH distributions in a single pass (the
  * target flag is an input column, not a second scan); the weight table
  * is `nBuckets` rows — broadcast to the token stream, never shuffled;
  * per-doc scoring is one hash aggregation on the doc key; the final
  * total order comes from [[GlobalRank]]'s range-partition rank, not a
  * SinglePartition window. Driver state: the `nBuckets`-row weight frame
  * and GlobalRank's per-partition offsets — both bounded by parallelism
  * and feature width, never by corpus size.
  */
object ImportanceResampling {

  /** Hashed feature bucket of a token: first 4 hex chars of md5 (the
    * [[Sampling.hashBucket]] convention) as an integer, mod `nBuckets`.
    * Non-negative by construction (hex4 ∈ [0, 65536)).
    */
  def bucket(tok: Column, nBuckets: Int): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast(LongType) % nBuckets

  /** (doc id, bucket, is_target) token-occurrence stream for `docs`;
    * empty tokens (blank text) are dropped on both engines identically.
    */
  private def tokenBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      nBuckets: Int
  ): DataFrame =
    docs
      .select(col(idCol), isTarget.as("graft_dsir_tgt"), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .select(col(idCol), col("graft_dsir_tgt"), bucket(col("tok"), nBuckets).as("b"))

  /** Per-raw-document importance scores and global selection rank.
    *
    * Output: (`idCol`, `n_tok` INT, `score` BIGINT, `rank` BIGINT,
    * `selected` BOOLEAN) — one row per raw document with ≥ 1 token;
    * `rank` is the exact 1-based position under (score desc, id asc) and
    * `selected` keeps the top `n_raw div keepDen` documents (the
    * resampling budget as a fixed fraction of the raw pool).
    */
  def scoreAndSelect(
      docs: DataFrame,
      isTarget: Column,
      idCol: String,
      textCol: String,
      nBuckets: Int = 256,
      scale: Long = 1000000L,
      keepDen: Long = 5L
  ): DataFrame = {
    val s = docs.sparkSession
    val tb = tokenBuckets(docs, idCol, textCol, isTarget, nBuckets)

    // Both distributions in ONE pass / ONE tiny (nBuckets-key, map-side
    // partial) aggregation; missing buckets still get the smoothed weight
    // via the full range frame.
    val counts = tb
      .groupBy(col("b"))
      .agg(
        sum(when(col("graft_dsir_tgt"), 1L).otherwise(0L)).as("t"),
        sum(when(col("graft_dsir_tgt"), 0L).otherwise(1L)).as("r"))
    val weights = s
      .range(nBuckets.toLong)
      .select(col("id").as("b"))
      .join(counts, Seq("b"), "left")
      .select(
        col("b"),
        expr(s"((coalesce(t, 0) + 1) * ${scale}L) div (coalesce(r, 0) + 1)").as("w"))

    val scored = tb
      .where(!col("graft_dsir_tgt"))
      .join(broadcast(weights), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tok"), sum(col("w")).as("score"))

    val ranked = GlobalRank.withGlobalRank(
      scored,
      Seq(col("score").desc, col(idCol)),
      outCol = "rank")
    // One count job over GlobalRank's already-persisted range partitions —
    // the resampling budget denominator (a single driver scalar, the BPE
    // winner-row contract).
    val nRaw = ranked.count()
    ranked.withColumn("selected", col("rank") <= lit(nRaw / keepDen))
  }
}
