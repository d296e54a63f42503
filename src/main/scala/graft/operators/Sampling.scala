package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic (content-hash) sampling for corpus curation.
  *
  * Unlike `df.sample()` / `rand()`, the keep/drop decision is a pure
  * function of the key bytes: re-running the pipeline — on any cluster, at
  * any partitioning, after any retry — selects the SAME rows, and a doc's
  * fate never changes when unrelated data is added. That reproducibility is
  * the property training-data pipelines need from a sampler (plus: the
  * sample composes with dedup — identical texts always land on the same
  * side of the cut).
  *
  * Mechanics: first 4 hex chars of md5(key) form a uniform bucket in
  * [0, 65536); keep rows whose bucket falls below rate·65536. Pure map-side
  * codegen'd expressions — no shuffle, no state, scales linearly.
  */
object Sampling {

  /** Lexicographic hex threshold for `rate` over a 4-hex-digit bucket.
    * rate ≥ 1 returns "g", which sorts above every hex string, i.e.
    * keep-all; rate ≤ 0 returns "0000", which no bucket sorts below.
    * Rates just below 1 clamp to 65535 (keep ≈ 99.998%) — rounding to
    * 65536 would render as the 5-char "10000", which sorts BELOW "1001"
    * and would silently keep ~6% instead of ~100%.
    */
  def thresholdHex(rate: Double): String =
    if (rate >= 1.0) "g"
    else f"${math.min(65535, math.max(0, math.round(rate * 65536).toInt))}%04x"

  /** Uniform [0, 65536) bucket of a key column, as 4 lowercase hex chars
    * (directly comparable against [[thresholdHex]] in any engine that
    * renders md5 as lowercase hex — Spark and DuckDB both do).
    */
  def hashBucket(key: Column): Column = substring(md5(key), 1, 4)

  /** Keep ~`rate` of rows, deterministically by content hash of `key`. */
  def deterministicSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(hashBucket(key) < lit(thresholdHex(rate)))

  /** Per-stratum deterministic sampling: rows whose `strata` value is in
    * `rates` keep that rate; all other strata keep `defaultRate`. The
    * standard shape for language/source rebalancing of a training corpus.
    */
  def stratifiedSample(
      df: DataFrame,
      key: Column,
      strata: Column,
      rates: Map[String, Double],
      defaultRate: Double = 1.0
  ): DataFrame = {
    val thr = rates.foldLeft(lit(thresholdHex(defaultRate)): Column) {
      case (acc, (stratum, rate)) =>
        when(strata === stratum, lit(thresholdHex(rate))).otherwise(acc)
    }
    df.where(hashBucket(key) < thr)
  }

  /** Per-group document cap: keep at most `cap` rows per `group`, chosen
    * by CONTENT-HASH order — the domain-cap step of corpus curation (a
    * handful of hosts dominating a crawl must not dominate the training
    * mix). Hash order makes the kept set a pure function of the data:
    * reproducible across runs/partitionings, and stable under appends
    * ONLY of later-hashing rows — unlike "first N seen", which depends on
    * arrival order nobody controls at scale.
    *
    * Scale: one hash exchange on the group key; the per-group sort is
    * rank-limited (Spark plans rank-predicate windows as
    * WindowGroupLimit, keeping ≤ cap+ties per partition before the final
    * window). The tie-break on the tieBreak column makes the choice total
    * even for identical texts.
    */
  def capPerGroup(
      df: DataFrame,
      group: Column,
      key: Column,
      tieBreak: Column,
      cap: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(md5(key), tieBreak)
    df.withColumn("graft_keep_rank", row_number().over(w))
      .where(col("graft_keep_rank") <= cap)
      .drop("graft_keep_rank")
  }

  /** Weighted sampling WITHOUT replacement, k per group, by sequential
    * Poisson sampling (Ohlsson 1998): each row gets priority
    * u/w — here the integer `hash40(key) div max(weight, 1)` with u the
    * uniform 40-bit content hash — and the k smallest priorities win.
    * Higher weight → smaller priority → more likely sampled; inclusion
    * probability is approximately proportional to weight (the πps design
    * used by real survey/curation samplers). The canonical use: sampling
    * documents for a training mix proportional to token count or quality
    * weight, reproducibly.
    *
    * Determinism is the whole point of the hash-priority formulation: the
    * sample is a pure function of (key bytes, weight), stable across
    * runs, partitionings, and engines — and all-integer, so an oracle can
    * replay it bit-for-bit. Ties (same priority, p ≈ 2^-40-scale) are
    * totalized by (md5(key), tieBreak).
    *
    * Scale: one hash exchange on the group key; the rank predicate plans
    * as WindowGroupLimit (each partition pre-limits to ≤ k before the
    * per-group sort), the x51 capPerGroup discipline. Weights are longs;
    * null/non-positive weights clamp to 1 rather than dividing by zero.
    */
  def weightedSamplePerGroup(
      df: DataFrame,
      group: Column,
      key: Column,
      weight: Column,
      tieBreak: Column,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val out = df
      .withColumn("graft_wsp_h", DistinctSketch.hash40(key))
      .withColumn("graft_wsp_w", greatest(weight.cast("long"), lit(1L)))
      .withColumn("graft_wsp_pri", expr("graft_wsp_h div graft_wsp_w"))
    val w = Window.partitionBy(group).orderBy(col("graft_wsp_pri"), md5(key), tieBreak)
    out
      .withColumn("graft_wsp_rank", row_number().over(w))
      .where(col("graft_wsp_rank") <= k)
      .withColumnRenamed("graft_wsp_pri", "priority")
      .drop("graft_wsp_h", "graft_wsp_w", "graft_wsp_rank")
  }

  /** Leakage-safe train/val/test split: assign every document a split by
    * the content hash of its NEAR-DUP CLUSTER ROOT, not of the document —
    * so a near-duplicate of a training document can never land in the
    * held-out set (the contamination mode plain random/hash splits are
    * blind to, and the reason SemDeDup/CCNet pipelines dedup BEFORE
    * splitting). Documents in no near-dup pair root to themselves.
    *
    * `pairs` is any undirected same-id-space pair frame (`a_id`/`b_id`) —
    * typically [[Dedup.ngramJaccardPairs]] or the MinHash/SimHash miners;
    * roots come from [[Cluster.connectedComponents]] (component minimum),
    * so the split is a pure function of corpus content: rerunning on any
    * partitioning, or re-mining pairs in any order, reassigns identically.
    *
    * Fractions are 4-hex-digit md5 bucket thresholds (the
    * [[thresholdHex]] convention): bucket < trainRate → "train",
    * < trainRate+valRate → "val", else "test".
    *
    * 100 TB shape: pair mining + CC dominate and are already bucketed /
    * per-round-bounded; the split itself adds one LEFT join of the corpus
    * against the component table (≤ one row per clustered doc, two longs
    * wide) and a map-side md5 — no new shuffle beyond the join.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      pairs: DataFrame,
      trainRate: Double,
      valRate: Double,
      idCol: String = "doc_id"
  ): DataFrame = {
    val comps = Cluster
      .connectedComponents(pairs)
      .select(col("id").as(idCol), col("comp"))
    docs
      .join(comps, Seq(idCol), "left")
      .withColumn("root_id", coalesce(col("comp"), col(idCol)))
      .withColumn("graft_b", hashBucket(col("root_id").cast("string")))
      .withColumn(
        "split",
        when(col("graft_b") < lit(thresholdHex(trainRate)), lit("train"))
          .when(col("graft_b") < lit(thresholdHex(trainRate + valRate)), lit("val"))
          .otherwise(lit("test")))
      .drop("comp", "graft_b")
  }
}
