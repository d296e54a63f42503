package graft

import java.time.{LocalDate, LocalTime}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions
import graft.operators._
import graft.sinks.ParquetSink
import graft.sources.TickerSource

/** Curation, sampling, packing, tokenizer-prep, sketch and frozen-index
  * surfaces (x51-x124): the second half of the LLM-data core.
  *
  * Part of the SparkEntry registry split — see [[SparkEntryBase]].
  */
private[graft] trait CurationIndexRegistry extends CoreTextRegistry {
  /** Fuzzy-match surface at distance 2 (x123): [[graft.operators.Fuzzy
    * .editDistance2Pairs]] over the part-name domain — two-deletion
    * SymSpell blocking (provably complete for lev ≤ 2, see the operator
    * scaladoc) with the exact `levenshtein` verify. The domain
    * (`p_name`, 64 varied multi-word phrases in this testdata) exercises
    * real d=2 structure — substitution+substitution across word
    * boundaries, insert+delete pairs — unlike p_brand where a shared
    * 6-char prefix makes every pair trivially ≤ 2. The oracle is the
    * honest brute-force: DuckDB levenshtein over all value pairs,
    * threshold 2 — so blocking completeness is certified, not assumed.
    */
  protected def x123(s: SparkSession, dir: String): DataFrame =
    Fuzzy
      .editDistance2Pairs(t(s, dir, "part"), "p_name")
      .orderBy(col("a_val"), col("b_val"))

  /** Curation surface: per-source document cap (domain capping) — keep at
    * most 30 docs per source, chosen by content-hash order so the kept
    * set is reproducible and arrival-order-free. Plan is a rank-limited
    * window (WindowGroupLimit) over one source exchange.
    */
  protected def x51(s: SparkSession, dir: String): DataFrame =
    Sampling
      .capPerGroup(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("text")),
        group = col("source"),
        key = col("text"),
        tieBreak = col("doc_id"),
        cap = 30
      )
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))

  /** Robust-stats surface #2: per-event-type winsorization audit — exact
    * p05/p95 clip bounds plus all-integer counts of what each side would
    * clip. Same percentile parity and broadcast shape as x48.
    */
  protected def x52(s: SparkSession, dir: String): DataFrame =
    Robust
      .winsorBounds(ev(s, dir), col("event_type"), col("value"))
      .select(
        col("graft_key").as("event_type"),
        col("lo"),
        col("hi"),
        col("n_below"),
        col("n_above"),
        col("n_total")
      )
      .orderBy(col("event_type"))

  /** Curation surface: cross-document segment dedup (C4-style "remove
    * duplicated lines corpus-wide" on the pipeline's own 8-token chunking
    * grid) — see [[graft.operators.Dedup.segmentDedup]]. The md5 of each
    * reassembled document is in the contract, so the oracle must agree on
    * the split, the keep-first rule AND the reassembly byte-for-byte.
    */
  protected def x55(s: SparkSession, dir: String): DataFrame =
    Dedup
      .segmentDedup(dts(s, dir).select(col("doc_id"), col("text")), window = 8)
      .orderBy(col("doc_id"))

  /** Distinct-count sketch surface: distinct users per event type by KMV
    * k-minimum-values (k = 64) next to the exact twin — the sketch whose
    * exchange stays O(k) per group regardless of cardinality, where exact
    * `count(distinct)` ships every (group, user) pair; see
    * [[graft.operators.DistinctSketch]]. The SFs split the contract's two
    * branches: 15 users/type at sf0.001 exercises exact-below-k
    * (kth_hash NULL), 150 at sf0.01 the (k-1)·2^40/h_(k) estimator —
    * both get driver coverage. The oracle replays hash, k-minima, and
    * integer-division estimate bit-for-bit.
    */
  protected def x57(s: SparkSession, dir: String): DataFrame = {
    val events = ev(s, dir)
    val sketch = DistinctSketch.kmvDistinct(
      events.select(col("event_type"), col("user_id")),
      groupCols = Seq("event_type"),
      elem = col("user_id"),
      k = 64
    )
    val exact = events
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    sketch.join(exact, Seq("event_type")).orderBy(col("event_type"))
  }

  /** Rule-cascade filtering surface: Gopher structural screens (token
    * count, mean word length, stopword presence) in audit shape — per-rule
    * flags plus the final keep, all integer arithmetic, map-only; see
    * [[graft.operators.QualityFilter]]. At sf0.01 every rule cuts both
    * ways (351/498/317 of 500 pass; 252 keep), so the oracle exercises
    * each flag's boundary.
    */
  protected def x58(s: SparkSession, dir: String): DataFrame =
    QualityFilter
      .gopherFlags(dts(s, dir).select(col("doc_id"), col("text")))
      .select(
        col("doc_id"), col("n_tokens"), col("sum_token_chars"), col("n_stopwords"),
        col("pass_count"), col("pass_meanlen"), col("pass_stop"), col("keep"))
      .orderBy(col("doc_id"))

  /** Weighted-sampling surface: 30 docs per language, inclusion odds
    * proportional to token count, by deterministic sequential Poisson
    * sampling — see [[graft.operators.Sampling.weightedSamplePerGroup]].
    * The integer priority (hash40 div weight) makes the sample replayable
    * bit-for-bit by the oracle; sf0.001's 10-doc groups exercise the
    * k-exceeds-group branch, sf0.01's 100-doc groups the real selection.
    */
  protected def x59(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("weight", size(TextAnalysis.tokens(col("text"))).cast("long"))
    Sampling
      .weightedSamplePerGroup(
        docs,
        group = col("lang"),
        key = col("doc_id").cast("string"),
        weight = col("weight"),
        tieBreak = col("doc_id"),
        k = 30
      )
      .select(col("lang"), col("doc_id"), col("weight"), col("priority"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Count-min-sketch surface: every vocabulary token's point estimate
    * from ONE depth=3 × width=16 counter matrix next to its exact count —
    * see [[graft.operators.FrequencySketch]]. The 31-token vocabulary in
    * 16 cells/row guarantees collisions (pigeonhole), so both contract
    * branches get driver coverage at sf0.01: 21 tokens overestimated,
    * 10 exact, `overestimate >= 0` for all (the CMS one-sided bound).
    * The oracle replays every cell and every min-of-3 estimate
    * bit-for-bit from the same md5 row hashes.
    */
  protected def x60(s: SparkSession, dir: String): DataFrame =
    FrequencySketch
      .cmsTokenCounts(
        dts(s, dir).select(col("text")),
        text = col("text"),
        depth = cmsDepth,
        width = cmsWidth
      )
      .orderBy(col("token"))

  /** Collocation-mining surface: every adjacent-pair phrase score
    * (Mikolov word2vec formula, δ = 2, threshold 1.3) next to its raw
    * counts — see [[graft.operators.TextAnalysis.collocations]]. At both
    * gate SFs the 916 distinct bigrams split all three contract branches
    * (24-27 phrases, ~12 discount-zeroed rare pairs, the rest plain),
    * and the integer lift replays exactly in the oracle.
    */
  protected def x61(s: SparkSession, dir: String): DataFrame =
    TextAnalysis
      .collocations(
        dts(s, dir).select(col("text")),
        delta = 2L,
        thresholdX1000 = 1300L
      )
      .select(
        col("w1"), col("w2"), col("cnt_pair"), col("cnt_w1"), col("cnt_w2"),
        col("lift_x1000"), col("is_phrase"))
      .orderBy(col("w1"), col("w2"))

  /** Scalable exact-quantile surface: per-event-type p50 AND p95 of the
    * integer cents value by two-pass histogram refinement — see
    * [[graft.operators.Robust.binnedQuantileDisc]]. No reducer buffers a
    * group's values (the open-domain upgrade to x48/x52's per-group
    * percentile buffers): 2^10-cent bins give ~48 occupied bins and ~40
    * in-bin rows per group at sf0.01. Discrete-quantile contract — the
    * exact element at rank (p·(n−1)) div 1 — so the oracle replays it
    * with a plain row_number selection, all-integer.
    */
  protected def x62(s: SparkSession, dir: String): DataFrame = {
    val cents = ev(s, dir)
      .select(
        col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
    def q(pNum: Long, pDenom: Long, label: String) =
      Robust
        .binnedQuantileDisc(cents, col("event_type"), col("v"),
          pNum = pNum, pDenom = pDenom, binShift = 10)
        .select(
          col("graft_key").as("event_type"), lit(label).as("p_label"),
          col("n_total"), col("target_rank"), col("q_value"))
    q(1, 2, "p50").unionAll(q(95, 100, "p95")).orderBy(col("event_type"), col("p_label"))
  }

  /** BPE vocabulary-learning surface: the first 3 merges over the
    * documents corpus — see [[graft.operators.Bpe]]. Each iteration is
    * vocabulary-sized (the corpus collapses to word counts first), the
    * winner is one TakeOrdered row of driver state, and the double-space
    * canonical-merge encoding makes literal string replace ≡ leftmost
    * non-overlapping BPE on BOTH engines, so the oracle replays merges,
    * tie-breaks, weighted counts and post-merge corpus symbol totals
    * exactly (validated against an independent list-walk reference).
    */
  /** Shared learned-merge cache (r11 verdict #2): x64 (learn), x65
    * (segment) and x121 (encode) all consume the IDENTICAL m-round merge
    * chain over the same corpus, and the chain is the only
    * driver-serialized computation in the registry (~19.5 s of the 122 s
    * bench when re-learned three times). Learning is memoized per
    * (dir, m): the cached value is the m-row merge table itself —
    * bounded driver state by the learnMerges contract, NOT corpus data —
    * so semantics are unchanged (same chain, same oracle) and each bench
    * JVM pays the 64-round control loop exactly once per corpus.
    */
  // Keyed by (dir, m) ONLY — deliberately NOT by the session: the value
  // is a pure function of the corpus and the merge count (learnMerges is
  // deterministic), so a session component buys nothing, and an IDENTITY
  // HASH of a session is exactly the keying the nearDupIdxSlot scaladoc
  // rejects (it can collide across a stopped and a live session and serve
  // stale state). Bounded by the number of distinct SF dirs a JVM touches.
  protected val bpeMergeCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Int), Seq[(Int, String, String, String, Long, Long)]]()

  protected def learnedMerges(
      s: SparkSession, dir: String): Seq[(Int, String, String, String, Long, Long)] =
    bpeMergeCache.computeIfAbsent(
      (dir, bpeMerges),
      _ =>
        Bpe
          .learnMerges(dts(s, dir).select(col("text")), m = bpeMerges)
          .orderBy(col("iter"))
          .collect()
          .map(r =>
            (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
              r.getLong(4), r.getLong(5)))
          .toSeq)

  protected def x64(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    learnedMerges(s, dir)
      .toDF("iter", "left", "right", "merged", "pair_count", "corpus_symbols_after")
      .orderBy(col("iter"))
  }

  /** BPE encode surface: every distinct corpus word segmented by the x64
    * merge table, in learned order — see
    * [[graft.operators.Bpe.segmentWords]]. The merge list is bounded
    * driver state (3 rows) folded into chained literal replaces; the
    * oracle reads the SAME unrolled CTE chain's final word table, so
    * train ≡ encode consistency is part of the contract.
    */
  protected def x65(s: SparkSession, dir: String): DataFrame = {
    val docs = dts(s, dir).select(col("text"))
    val merges = learnedMerges(s, dir).map(t => (t._2, t._3))
    Bpe.segmentWords(docs, merges).orderBy(col("w"))
  }

  /** BPE corpus-encode surface (x121): every document rendered to the
    * subword token ids a training run consumes — the third leg of
    * tokenizer prep after x64 (learn) and x65 (segment). See
    * [[graft.operators.Bpe.encodeCorpus]]: frequency-ordered vocabulary
    * ids (bounded by alphabet + m merges — driver-literal by
    * construction), one broadcast join of the corpus position explode
    * against the vocabulary-sized segmentation table. The oracle extends
    * the x64/x65 unrolled chain with the vocab ranking and the same
    * parallel-unnest position indexing, so train ≡ segment ≡ encode is
    * one consistency chain certified end to end.
    */
  protected def x121(s: SparkSession, dir: String): DataFrame = {
    val docs = dts(s, dir).select(col("doc_id"), col("text"))
    val merges = learnedMerges(s, dir).map(t => (t._2, t._3))
    Bpe
      .encodeCorpus(docs, merges)
      .orderBy(col("doc_id"), col("pos"), col("sub_pos"))
  }

  /** Stable-sharding surface: rendezvous (highest-random-weight)
    * assignment of every document to one of 8 shards — see
    * [[graft.operators.Mix.rendezvousShard]]. Map-only, md5-replayable;
    * the oracle recomputes all 8 weights per doc and takes the same
    * (weight desc, shard asc) argmax.
    */
  protected def x66(s: SparkSession, dir: String): DataFrame =
    Mix
      .rendezvousShard(
        t(s, dir, "documents").select(col("doc_id")),
        key = col("doc_id"),
        nShards = hrwShards)
      .select(col("doc_id"), col("shard"), col("shard_weight"))
      .orderBy(col("doc_id"))

  /** x66 shard count, shared between the Spark call and the oracle. */
  protected val hrwShards = 8

  /** Incremental-ingest surface: docs ≥ 250 plus 20 PLANTED exact copies
    * (ids +10000, texts of docs < 20) arrive as the new batch against the
    * < 250 index — see [[graft.operators.Dedup.incrementalClassify]].
    * All three classes get driver coverage at both SFs: 20 exact, 12-13
    * near (the cross-split Jaccard ≥ 0.5 pairs), the rest novel; the
    * planted copies also near-match (Jaccard 1) so the oracle exercises
    * the exact-over-near precedence.
    */
  protected def x67(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val index = docs.where(col("doc_id") < 250)
    val batch = docs.where(col("doc_id") >= 250)
      .unionAll(docs.where(col("doc_id") < 20)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    Dedup
      .incrementalClassify(batch, index, n = 3, threshold = 0.5)
      .msorted(col("doc_id"))
  }

  /** Burst-detection surface: per-(event_type, epoch-hour) counts flagged
    * by the all-integer median/MAD rule — see
    * [[graft.operators.Robust.burstScreen]]. Buckets from the raw
    * `ts_us div 3600000000` (the ev() micros contract), 89-121 flagged
    * buckets of ~3400/870 at the gate SFs so both flag values get
    * coverage.
    */
  protected def x68(s: SparkSession, dir: String): DataFrame =
    Robust
      .burstScreen(
        ev(s, dir),
        keyCol = col("event_type"),
        bucketCol = expr("ts_us div 3600000000"))
      .select(
        col("graft_key").as("event_type"), col("bucket"),
        col("n_events"), col("is_burst"))
      .orderBy(col("event_type"), col("bucket"))

  /** LM fluency scoring surface (x70): bigram stupid-backoff LM trained
    * on the even-id half of the corpus, scoring the odd-id half — the
    * CCNet reference-corpus-vs-target split, and the split is what makes
    * both contract branches live (unseen target bigrams exercise the
    * backoff; self-scoring would never miss). See
    * [[graft.operators.TextAnalysis.lmFluency]] for the all-integer
    * ppm contract.
    */
  protected def x70(s: SparkSession, dir: String): DataFrame = {
    val docs = dts(s, dir).select(col("doc_id"), col("text"))
    TextAnalysis
      .lmFluency(
        refDocs = docs.where(col("doc_id") % 2 === 0),
        targetDocs = docs.where(col("doc_id") % 2 === 1))
      // the operator's NULL-when-no-pairs would render the BIGINT column
      // float64 through pandas if any short doc appeared — sentinel -1
      // keeps the hashed column integer-rendered on both engines
      .select(
        col("doc_id"), col("n_pairs"), col("n_hit"),
        coalesce(col("fluency_ppm"), lit(-1L)).as("fluency_ppm"))
      .msorted(col("doc_id"))
  }

  /** Leakage-safe split surface (x71): train/val/test assignment keyed by
    * the md5 bucket of each document's NEAR-DUP CLUSTER ROOT (x14's
    * component minimum; singletons root to themselves) — near-duplicates
    * provably share a split. 80/10/10 via the [[graft.operators
    * .Sampling.thresholdHex]] hex-threshold convention.
    */
  protected def x71(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    Sampling
      .leakageSafeSplit(
        docs.select(col("doc_id")),
        Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5),
        trainRate = 0.8,
        valRate = 0.1)
      .orderBy(col("doc_id"))
  }

  /** Temperature-mixing planner surface (x73): per-source token totals →
    * exact-isqrt T=2 weights → ppm shares/quotas/keep-rates — see
    * [[graft.operators.Mix.temperatureQuotas]]. Whitespace token counts
    * so the oracle replays the count, the corrected isqrt, and every
    * integer division bit-for-bit.
    */
  protected def x73(s: SparkSession, dir: String): DataFrame =
    Mix
      .temperatureQuotas(
        dts(s, dir),
        group = col("source"),
        tokenCount = size(TextAnalysis.tokens(col("text"))))
      .orderBy(col("source"))

  /** Winnowing fingerprint surface (x74): per-doc fingerprint summary of
    * [[graft.operators.Dedup.winnowFingerprints]] (k = 3 grams, window
    * w = 4) — gram count, selected-fingerprint count, and the integer
    * checksum of selected hashes, so the DuckDB oracle must replay the
    * hash40, the rightmost-min encoding, and the frame-window selection
    * bit-for-bit to match.
    */
  protected def x74(s: SparkSession, dir: String): DataFrame = {
    // dts: the summary branch re-tokenizes every doc for n_grams — on the
    // raw single-file scan that ran serial (measured 1.8-core occupancy
    // for the whole query even after the operator-side spread)
    val docs = dts(s, dir).select(col("doc_id"), col("text"))
    val fps = Dedup.winnowFingerprints(docs, k = 3, w = 4)
    val agg = fps
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fps"), sum(col("fp_hash")).as("fp_sum"))
    docs
      .select(
        col("doc_id"),
        size(TextAnalysis.rawNgrams(TextAnalysis.tokens(col("text")), 3)).as("n_grams"))
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_grams"),
        coalesce(col("n_fps"), lit(0L)).as("n_fps"),
        coalesce(col("fp_sum"), lit(0L)).as("fp_sum"))
      .orderBy(col("doc_id"))
  }

  /** Memoized [[graft.operators.Dedup.NearDupIndex]] per (session, dir):
    * the x75 surface measures the AMORTIZED per-delivery cost — the whole
    * point of the persisted-index posture is that the index is built once
    * and reused across deliveries, so in Bench the warm-up run pays the
    * build and the timed runs measure what a production delivery pays
    * (the first `runs` entry of a no-warmup run shows build+classify;
    * disclosed here and in SURVEY §8.2). Verify builds it exactly once.
    *
    * SINGLE slot keyed by (session REFERENCE, dir), not a growing map
    * keyed by an identity hash: `eq` on the live session object cannot
    * collide across a stopped and a new session (an identity HASH can —
    * and would serve a dead session's persisted frames), and replacement
    * is a compare-and-set that explicitly `unpersistAll()`s the losing
    * index's four frames — concurrent first invocations can't clobber
    * each other's slot or leak cached partitions until the
    * ContextCleaner gets around to them.
    */
  protected val nearDupIdxSlot =
    new java.util.concurrent.atomic.AtomicReference[(SparkSession, String, Dedup.NearDupIndex)]

  /** Amortized incremental-ingest surface: the same delivery, index,
    * parameters, and output contract as x67, but against the one-time
    * [[graft.operators.Dedup.buildNearDupIndex]] artifact — only the
    * delivery is shingled per run; the index contributes keyed joins
    * against its persisted digest/lookup/array/prefix frames.
    * FROZEN-INDEX semantics: df statistics fixed at build time (≡ x67's
    * union semantics unless a delivery pushes a shingle's df across
    * maxDf — impossible at gate corpus sizes, spec-pinned in general).
    * The oracle replays frozen semantics brute-force: index-df stop set,
    * kept shingle sets (delivery-unseen shingles count in the set size,
    * never the intersection), 6-dp Jaccard, exact > near precedence.
    */
  protected def x75(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val batch = docs.where(col("doc_id") >= 250)
      .unionAll(docs.where(col("doc_id") < 20)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val cur = nearDupIdxSlot.get()
    val idx =
      if (cur != null && (cur._1 eq s) && cur._2 == dir) cur._3
      else {
        // CAS so concurrent first invocations build at most one winning
        // index: the loser unpersists ITS frames immediately and serves
        // the winner's; a stale replaced entry is unpersisted by the
        // winner (it can't still be racing — its key differs).
        val built = Dedup.buildNearDupIndex(
          docs.where(col("doc_id") < 250), n = 3, threshold = 0.5)
        if (nearDupIdxSlot.compareAndSet(cur, (s, dir, built))) {
          if (cur != null) cur._3.unpersistAll()
          built
        } else {
          val winner = nearDupIdxSlot.get()
          if (winner != null && (winner._1 eq s) && winner._2 == dir) {
            built.unpersistAll()
            winner._3
          } else {
            // keys differ: ours will never be memoized, so release its
            // four cached frames NOW rather than waiting on GC + the
            // ContextCleaner. unpersist() is advisory, not destructive —
            // the lazy classify plan below still evaluates correctly
            // against the un-cached frames (it recomputes the mining
            // instead of reading cache; slow-but-correct on this
            // race-only path, and nothing lingers).
            built.unpersistAll()
            built
          }
        }
      }
    Dedup
      .incrementalClassifyIndexed(batch, idx)
      .orderBy(col("doc_id"))
  }

  /** Single slot for x124's LOADED bucketed index, same keying discipline
    * as [[nearDupIdxSlot]] (session REFERENCE + dir, CAS replacement).
    * The slot holds table-backed frames — the on-disk bucket is the
    * persistence, so a losing/replaced entry has nothing to unpersist.
    */
  protected val bucketedIdxSlot =
    new java.util.concurrent.atomic.AtomicReference[(SparkSession, String, Dedup.NearDupIndex)]

  /** The x75 classification against the ON-DISK BUCKETED index artifact
    * (x124): [[graft.operators.Dedup.writeNearDupIndexBucketed]] persists
    * the four frames `bucketBy` exactly their delivery-join keys, and the
    * classification re-opens them as bucketed tables — so the production
    * at-rest posture (the r11 verdict-#3 plan property NearDupBucketedSpec
    * pins: no raw index frame ever re-shuffles) is ALSO hash-oracled end
    * to end at both gate SFs, not only spec-pinned. Same index split,
    * same delivery, same frozen semantics as x75; the oracle is x75's
    * verbatim by construction. Bench fidelity, the x75 disclosure: the
    * warm-up pays build + bucketed WRITE; timed runs measure what a
    * production delivery pays against the at-rest artifact.
    */
  protected def x124(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val batch = docs.where(col("doc_id") >= 250)
      .unionAll(docs.where(col("doc_id") < 20)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val cur = bucketedIdxSlot.get()
    val idx =
      if (cur != null && (cur._1 eq s) && cur._2 == dir) cur._3
      else bucketedIdxSlot.synchronized {
        // SERIALIZED, not CAS-raced like the in-memory x75 slot: two
        // racers here would DROP + delete + rewrite the SAME warehouse
        // location concurrently (the table prefix is deterministic), so
        // the loser could destroy files the winner's scan is reading.
        // An in-memory slot loser only unpersists its own frames; a
        // filesystem artifact needs mutual exclusion. Double-check under
        // the lock so late arrivals reuse the winner's tables.
        val again = bucketedIdxSlot.get()
        if (again != null && (again._1 eq s) && again._2 == dir) again._3
        else {
          // dir-disambiguated table names: one session may serve several
          // SF dirs (the test session does); the artifact of one must not
          // shadow another's
          val prefix = s"graft_ndidx_x124_${Integer.toHexString(dir.hashCode)}"
          val built = Dedup.buildNearDupIndex(
            docs.where(col("doc_id") < 250), n = 3, threshold = 0.5)
          Dedup.writeNearDupIndexBucketed(built, buckets = 8, prefix = prefix)
          built.unpersistAll() // the bucketed write materialized everything
          val loaded = Dedup.loadNearDupIndexBucketed(
            s, n = 3, threshold = 0.5, prefix = prefix)
          bucketedIdxSlot.set((s, dir, loaded))
          loaded
        }
      }
    Dedup
      .incrementalClassifyIndexed(batch, idx)
      .orderBy(col("doc_id"))
  }

  /** HLL distinct-sketch surface (x79): per-source distinct-SHINGLE
    * estimate (3-gram vocabulary size, ~1.2-1.5k per source at sf0.01 —
    * solidly in HLL's raw regime; the corpus's flat 31-token vocabulary
    * would sit in the small-range regime the raw estimator disclaims)
    * from the 64-register HyperLogLog file — the constant-state
    * union-friendly companion to x57's KMV; see
    * [[graft.operators.DistinctSketch.hllDistinct]] for the
    * exact-integer estimator contract the oracle replays (registers from
    * hash40 top-6-bit buckets, rho capped at 31, est = α_ppm·m²·2^R div
    * (10⁶·S)). r_max / s_scaled / n_zero_regs surface the whole register
    * summary so the driver hash pins the registers, not just the
    * estimate.
    */
  protected def x79(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    DistinctSketch
      .hllDistinct(
        dts(s, dir)
          .select(
            col("source"),
            explode(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)).as("g")),
        Seq("source"),
        col("g"))
      .orderBy(col("source"))
  }

  /** Rank-normalization surface (x83): documents calibrated to integer
    * rank_ppm by token count with doc_id tie-break — the two-phase
    * GlobalRank machinery end-to-end (no single-partition window), see
    * [[graft.operators.Robust.rankNormalizePpm]]. The oracle replays
    * row_number + the exact ppm division.
    */
  protected def x83(s: SparkSession, dir: String): DataFrame =
    Robust
      .rankNormalizePpm(
        dts(s, dir)
          .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).as("n_tokens")),
        sort = Seq(col("n_tokens"), col("doc_id")))
      .orderBy(col("doc_id"))

  /** Corpus-diff surface (x84): documents vs a simulated v2 release —
    * ids % 13 = 0 removed, % 11 = 0 (surviving) rewritten with a ' rev2'
    * suffix, % 17 = 0 re-added as fresh ids +30000 — so all four
    * statuses are live. Digest-only comparison, see
    * [[graft.operators.CorpusDiff]].
    */
  protected def x84(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val v2 = docs
      .where(col("doc_id") % 13 =!= 0)
      .select(
        col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionAll(docs.where(col("doc_id") % 17 === 0)
        .select(
          (col("doc_id") + 30000).as("doc_id"),
          concat(lit("new release doc "), col("doc_id")).as("text")))
    CorpusDiff.diff(docs, v2).orderBy(col("doc_id"))
  }

  /** Intra-document sentence dedup surface (x96): the C4-style "drop
    * repeated lines" curation verb, expressed ENTIRELY in builtins —
    * `split` on the sentence boundary, `array_distinct` (whose
    * first-occurrence order preservation is the load-bearing semantic,
    * spec-pinned in UrlAndSentenceSpec), `concat_ws` rebuild — zero
    * custom code, fully codegen'd, map-only. The input plants a
    * duplication (text || '. ' || text) so the operator provably fires
    * on every row; sentences repeated WITHIN the original text collapse
    * too, and the oracle replays the same first-occurrence algorithm
    * (min-index window) rather than assuming the plant.
    */
  protected def x96(s: SparkSession, dir: String): DataFrame = {
    val sents = split(concat(col("text"), lit(". "), col("text")), "\\. ")
    dts(s, dir)
      .where(col("doc_id") % 4 === 1)
      .select(
        col("doc_id"),
        concat_ws(". ", array_distinct(sents)).as("clean_text"),
        size(sents).as("n_sent"),
        (size(sents) - size(array_distinct(sents))).as("n_dupes"))
      .orderBy(col("doc_id"))
  }

  /** DSIR importance-resampling surface (x100): hashed-token importance
    * weighting of the raw pool (doc_id % 7 ≠ 0) toward a target exemplar
    * set (doc_id % 7 = 0) — see [[graft.operators.ImportanceResampling]]
    * for the fixed-point integer formulation and the one-pass /
    * broadcast-weights / range-partition-rank scale posture. The oracle
    * replays the exact same arithmetic (4-hex md5 buckets via positional
    * strpos decode, add-one-smoothed integer ratio weights, occurrence
    * sums, row_number under (score desc, id asc), top n_raw//5 keep) so a
    * hash match certifies bucketing, both distributions, the weight
    * table, and the selection rank end to end.
    */
  protected def x100(s: SparkSession, dir: String): DataFrame =
    ImportanceResampling
      .scoreAndSelect(
        dts(s, dir).select(col("doc_id"), col("text")),
        isTarget = col("doc_id") % 7 === 0,
        idCol = "doc_id",
        textCol = "text")
      .orderBy(col("doc_id"))

  /** Anchor-text aggregation surface (x101): per link target, the
    * in-link count, distinct-source count, and plurality anchor string —
    * [[graft.functions.HtmlAnchors]]' (href, text) walk feeding
    * [[graft.operators.AnchorText.aggregate]]. Each planted page carries
    * its five closed-form anchors PLUS an appended snippet re-linking
    * the page's hub under a doc-varying text ("site {id%5}"), so hub
    * targets aggregate 6 distinct strings with "more links here" as the
    * clear plurality — the argmax, distinct counts, and tie-break all do
    * real work. The oracle rebuilds the pair stream closed-form (no HTML
    * in SQL) and replays count → row_number plurality, so a hash match
    * certifies the anchor-text WALK (entity/whitespace rules included:
    * any leakage of markup into a text breaks a string) and the
    * aggregation.
    */
  protected def x101(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val page = concat(
      GraftFunctions.buildHtml(col("doc_id"), col("text")),
      lit("<p><a href=\"/q/"), (col("doc_id") % 13).cast("string"),
      lit("\">site "), (col("doc_id") % 5).cast("string"), lit("</a></p>"))
    val pairs = t(s, dir, "documents")
      .where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(GraftFunctions.htmlAnchors(page)).as("a"))
      .select(col("doc_id"), col("a.href").as("href"), col("a.text").as("text"))
    AnchorText.aggregate(pairs).orderBy(col("target"))
  }

  /** Sitemap-parsing surface (x102): URL discovery, the crawl stage
    * beside x99's robots politeness — [[graft.functions.SitemapUrls]]'
    * XML-lite walk over [[graft.functions.BuildSitemap]] fixtures. The
    * `% 5 = 2` subset hits every fixture branch: sitemapindex docs
    * (id % 4 = 0, two `<sitemap>` entries), fully-populated urlset
    * entries, the optional-fields-omitted branch (id % 3 = 0), the
    * `&amp;`-entity loc, and the whitespace-padded CDATA loc. The oracle
    * rebuilds each row closed-form (decoded/trimmed values directly), so
    * a hash match certifies entity decode, CDATA verbatim capture, trim,
    * the required-loc rule, and exact integer-ppm priority parsing.
    */
  protected def x102(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    t(s, dir, "documents")
      .where(col("doc_id") % 5 === 2)
      .select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        posexplode(
          GraftFunctions.sitemapUrls(GraftFunctions.buildSitemap(col("doc_id"))))
          .as(Seq("pos", "e")))
      .select(
        col("doc_id"),
        col("pos").cast("int").as("entry_idx"),
        col("e.kind").as("kind"),
        col("e.loc").as("loc"),
        col("e.lastmod").as("lastmod"),
        col("e.changefreq").as("changefreq"),
        col("e.priority_ppm").as("priority_ppm"))
      .orderBy(col("doc_id"), col("entry_idx"))
  }

  /** CCNet-style per-language fluency bucketing surface (x103): the
    * curation step Wenzek et al. 2020 run after LM scoring — split each
    * language's documents into head / middle / tail thirds by model
    * score, so downstream mixing can oversample the head. Composes the
    * x05 language-ID argmax with the x70 bigram stupid-backoff fluency
    * score (reference = even ids, scored pool = odd ids; short docs
    * carry the -1 sentinel and sink to the tail), then assigns EXACT
    * SQL-ntile terciles per language via
    * [[graft.operators.GroupNtile]] — class-table rank decomposition,
    * no per-language global sort, so the head language's 100 TB share
    * never funnels through one task. The oracle replays language ID,
    * the LM, and `ntile(3)` verbatim, and the emitted per-language rank
    * pins the full total order, not just the bucket boundaries.
    */
  protected def x103(s: SparkSession, dir: String): DataFrame = {
    val docs = dts(s, dir).select(col("doc_id"), col("text"))
    val scored = TextAnalysis
      .lmFluency(
        refDocs = docs.where(col("doc_id") % 2 === 0),
        targetDocs = docs.where(col("doc_id") % 2 === 1))
      .select(
        col("doc_id"),
        coalesce(col("fluency_ppm"), lit(-1L)).as("fluency_ppm"))
    val lang = docs
      .where(col("doc_id") % 2 === 1)
      .select(
        col("doc_id"),
        TextAnalysis.langId(TextAnalysis.tokens(col("text"))).as("lang"))
    GroupNtile
      .withGroupNtile(
        lang.join(scored, Seq("doc_id")),
        groupCol = "lang",
        scoreCol = "fluency_ppm",
        tieCol = "doc_id",
        tiles = 3)
      .select(
        col("doc_id"), col("lang"), col("fluency_ppm"),
        col("rank").as("lrank"),
        when(col("tile") === 1, "head")
          .when(col("tile") === 2, "middle")
          .otherwise("tail")
          .as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Curriculum-interleave surface (x105): deterministic easy→hard
    * training order (difficulty = whitespace token count) round-robined
    * across three synthetic sources (doc_id mod 3) — see
    * [[graft.operators.Curriculum.interleaveBySource]] for the
    * closed-form position and the no-global-window scale posture. The
    * oracle computes the SAME order via the definitional window pair
    * (per-source row_number, then a global row_number over (rank,
    * source)), so a hash match proves the closed form equals the window
    * semantics on real data — unequal source sizes and the tail rounds
    * where short sources drop out included.
    */
  protected def x105(s: SparkSession, dir: String): DataFrame =
    Curriculum
      .interleaveBySource(
        dts(s, dir)
          .select(
            col("doc_id"),
            when(col("doc_id") % 3 === 0, "src_a")
              .when(col("doc_id") % 3 === 1, "src_b")
              .otherwise("src_c")
              .as("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok")),
        sourceCol = "source",
        difficultyCol = "n_tok",
        tieCol = "doc_id")
      .select(col("doc_id"), col("source"), col("n_tok"), col("src_rank"), col("pos"))
      .orderBy(col("doc_id"))

  /** Domain-stats rollup surface (x106): host-granularity curation —
    * hosts derived by [[graft.functions.UrlNormalize]] from mixed-case
    * default-port synthetic URLs (40 hosts: 5 apex + 35 subdomain),
    * languages from the x05 argmax, rolled up by
    * [[graft.operators.DomainStats.rollup]] with the thin-content block
    * rule at avg_tok < 54 (the corpus mean, so both verdicts stay
    * populated). The oracle writes the normalized hosts closed-form —
    * so a normalization defect surfaces as a host-key mismatch — and
    * replays the counts, integer-div mean, plurality argmax, and block
    * predicate.
    */
  protected def x106(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val ids = col("doc_id").cast("string")
    val url = when(
      col("doc_id") % 2 === 0,
      concat(lit("HTTP://EXample"), (col("doc_id") % 5).cast("string"),
        lit(".COM:80/p/"), ids))
      .otherwise(concat(lit("https://Sub"), (col("doc_id") % 7).cast("string"),
        lit(".EXample"), (col("doc_id") % 5).cast("string"),
        lit(".com:443/p/"), ids))
    DomainStats
      .rollup(
        dts(s, dir).select(
          GraftFunctions.urlNormalize(url).getField("host").as("host"),
          TextAnalysis.langId(TextAnalysis.tokens(col("text"))).as("lang"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok")),
        blockBelowAvgTok = 54L)
      .orderBy(col("host"))
  }

  /** UniMax language-balancing surface (x107): uniform token budget
    * across the x05 languages with a 1-epoch cap, at budget = half the
    * corpus — small languages saturate at their full token count, the
    * rest waterfill, so BOTH outcome classes are live. See
    * [[graft.operators.Mix.unimaxQuotas]] for the exact integer
    * waterfill and its prefix proof. One corpus aggregation; the
    * waterfill runs over the checkpointed per-language table (bounded
    * rows, the driver-scalar contract). The oracle replays the sorted
    * prefix predicate, remainder split, and ppm arithmetic in SQL
    * windows over the same tiny table.
    */
  protected def x107(s: SparkSession, dir: String): DataFrame = {
    val perLang = dts(s, dir)
      .select(
        TextAnalysis.langId(TextAnalysis.tokens(col("text"))).as("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(sum(col("n_tok")).as("n_tok"))
      .localCheckpoint()
    val totRow = perLang.agg(sum(col("n_tok"))).head()
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    Mix
      .unimaxQuotas(perLang, col("lang"), col("n_tok"),
        budget = total / 2, epochCap = 1L)
      .orderBy(col("lang"))
  }

  /** Obfuscation-resistant word-list filter surface (x108): the
    * badwords/spam gate with leet folding — see
    * [[graft.operators.TextAnalysis.foldConfusables]]. Injections per
    * id mod 3: a doubly-obfuscated spam tail ("w1n a pr1ze at the
    * c4$ino" — "prize"+"casino" hit only IF the fold works; "w1n" folds
    * to "win", deliberately NOT listed), a half-plain tail ("free
    * l0ttery t1cket" — "free"+"lottery" hit, "ticket" is not
    * listed), or none (the base corpus may still collide with the
    * list's plain words — the oracle replays, not assumes). Map-only
    * builtins; flagged at ≥ 2 hits so single incidental collisions
    * pass.
    */
  protected def x108(s: SparkSession, dir: String): DataFrame = {
    val words = Seq("casino", "lottery", "prize", "winner", "free")
    val injected = when(col("doc_id") % 3 === 0,
      concat(col("text"), lit(" w1n a pr1ze at the c4$ino")))
      .when(col("doc_id") % 3 === 1,
        concat(col("text"), lit(" free l0ttery t1cket")))
      .otherwise(col("text"))
    val hits = TextAnalysis.wordListHits(injected, words)
    dts(s, dir)
      .select(
        col("doc_id"),
        size(hits).as("n_hits"),
        size(array_distinct(hits)).as("n_distinct_hits"),
        array_min(hits).as("first_hit"),
        (size(hits) >= 2).as("flagged"))
      .orderBy(col("doc_id"))
  }

  /** Public-suffix surface (x109): registrable-domain (eTLD+1)
    * extraction per the publicsuffix.org algorithm — see
    * [[graft.operators.PublicSuffix]]. The host fixture hits every rule
    * kind: multi-label plain suffixes (co.uk), a private-registry entry
    * (github.io — and the longest-match rule beats its 'io' parent), the
    * `*.ck` wildcard, the `!www.ck` exception overriding it, the
    * implicit-`*` fallback for an unknown TLD, and a host that IS a
    * public suffix (NULL registrable). The oracle writes the expected
    * public_suffix/registrable closed-form per branch — hand-derived
    * from the PSL spec, not replayed — so a hash match certifies the
    * candidate generation, the two-kind equi-join, the
    * exception-then-longest argmax, and the +1-label cut.
    */
  protected def x109(s: SparkSession, dir: String): DataFrame = {
    val k = (col("doc_id") % 5).cast("string")
    val host = when(col("doc_id") % 6 === 0, concat(lit("www.example"), k, lit(".com")))
      .when(col("doc_id") % 6 === 1, concat(lit("a.b.example"), k, lit(".co.uk")))
      .when(col("doc_id") % 6 === 2, concat(lit("www.user"), k, lit(".github.io")))
      .when(col("doc_id") % 6 === 3, concat(lit("a.b"), k, lit(".ck")))
      .when(col("doc_id") % 6 === 4, lit("www.ck"))
      .otherwise(
        when(col("doc_id") % 12 === 5, lit("co.uk"))
          .otherwise(concat(lit("internal"), k, lit(".unknown"))))
    PublicSuffix
      .withRegistrableDomain(
        t(s, dir, "documents").select(col("doc_id"), host.as("host")),
        hostCol = "host")
      .select(col("doc_id"), col("host"), col("public_suffix"), col("registrable"))
      .orderBy(col("doc_id"))
  }

  /** Script-mix surface (x110): per-document Unicode script histogram +
    * mixed-script flag — keyword-stuffed spam mixes scripts; clean
    * corpora are script-coherent (a standard quality signal beside x04's
    * token counts and x05's language argmax). One codepoint pass via the
    * codegen'd [[graft.functions.ScriptCounts]]; injections per id mod 4
    * plant Cyrillic, CJK, and a three-script tail so every class and
    * both flag values are live. The oracle counts every class with
    * independent RE2 character-class regexes over the SAME injected
    * text — a replay by different machinery, so a walk defect (surrogate
    * mishandling, off-by-one range) hash-fails.
    */
  protected def x110(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val injected = when(col("doc_id") % 4 === 1, concat(col("text"), lit(" привет мир всем")))
      .when(col("doc_id") % 4 === 2, concat(col("text"), lit(" 你好世界")))
      .when(col("doc_id") % 4 === 3, concat(col("text"), lit(" mixed привет 你好")))
      .otherwise(col("text"))
    val sc = GraftFunctions.scriptCounts(injected)
    dts(s, dir)
      .select(col("doc_id"), sc.as("sc"))
      .select(
        col("doc_id"),
        col("sc.n_latin").as("n_latin"),
        col("sc.n_cyrillic").as("n_cyrillic"),
        col("sc.n_cjk").as("n_cjk"),
        col("sc.n_digit").as("n_digit"),
        col("sc.n_space").as("n_space"),
        col("sc.n_other").as("n_other"),
        when(col("sc.n_latin") >= col("sc.n_cyrillic") &&
          col("sc.n_latin") >= col("sc.n_cjk") && col("sc.n_latin") > 0, "latin")
          .when(col("sc.n_cyrillic") >= col("sc.n_cjk") && col("sc.n_cyrillic") > 0, "cyrillic")
          .when(col("sc.n_cjk") > 0, "cjk")
          .otherwise("none")
          .as("dominant"),
        ((col("sc.n_latin") > 0).cast("int") + (col("sc.n_cyrillic") > 0).cast("int") +
          (col("sc.n_cjk") > 0).cast("int") >= 2).as("mixed"))
      .orderBy(col("doc_id"))
  }

  /** The 12-token boilerplate span x114 plants (ONE Scala val
    * interpolated into both engines, the substrInjA convention):
    * all-uppercase, so the lowercase synthetic corpus can never
    * accidentally extend a planted span.
    */
  protected val spanInj =
    "REDISTRIBUTION AND USE IN SOURCE AND BINARY FORMS ARE PERMITTED HERE VERBATIM"

  /** Maximal-shared-span surface (x114): [[graft.operators.SubstringDedup
    * .maximalSharedSpans]] — the ZERO-MISS exact-substring guarantee
    * (Lee et al. 2022) x31's thinned anchors approximate: every maximal
    * shared run of ≥ 8 tokens, at arbitrary offsets. Docs ≡0 (mod 37)
    * APPEND the 12-token boilerplate, ≡0 (mod 41) PREPEND it (doc 0 hits
    * both; CASE order picks append on both engines) — so
    * append×prepend pairs share the span at (tail, 0), append×append at
    * (tail, tail): offset-independence is live in the gate, and the
    * corpus's organic 8-token repeats ride along. The oracle replays
    * stride-1 gram digests, the diagonal join, and the island
    * arithmetic — two engines, one algorithm, every row positional.
    */
  protected def x114(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 37 === 0, concat(col("text"), lit(" " + spanInj)))
          .when(col("doc_id") % 41 === 0, concat(lit(spanInj + " "), col("text")))
          .otherwise(col("text"))
          .as("text"))
    SubstringDedup
      .maximalSharedSpans(docs, l = 8)
      .orderBy(col("a_id"), col("b_id"), col("a_start"), col("b_start"))
  }

  /** Exact-substring CLEAN surface (x122): [[graft.operators
    * .SubstringDedup.removeSharedSpans]] over the SAME span-injected
    * corpus as x114 — the APPLY half of Lee et al.'s substring dedup:
    * every losing (b-side, min-id-keeps) span occurrence cut from its
    * document, overlapping spans merged by the islands window, text
    * rebuilt map-side from the per-doc interval list. The oracle extends
    * x114's replay with the same islands merge and a parallel-unnest
    * rebuild, so find ≡ remove is one certified chain.
    */
  protected def x122(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 37 === 0, concat(col("text"), lit(" " + spanInj)))
          .when(col("doc_id") % 41 === 0, concat(lit(spanInj + " "), col("text")))
          .otherwise(col("text"))
          .as("text"))
    SubstringDedup
      .removeSharedSpans(docs, l = 8)
      .orderBy(col("doc_id"))
  }

  /** Cross-document duplicate-gram-fraction surface (x116):
    * [[graft.operators.TextAnalysis.crossDocDupGramFraction]] at n = 5 —
    * the corpus duplication PROFILE (what share of each doc's distinct
    * 5-grams appear in other documents), the audit signal that finds
    * template farms before any pair miner runs. The synthetic corpus
    * keeps every output class live organically (429 zero-dup docs, 24
    * full-duplicate docs, a 9% mean at sf0.01 — no injection needed);
    * the oracle replays distinct shingling, the df table, and the
    * floor-ppm division.
    */
  protected def x116(s: SparkSession, dir: String): DataFrame =
    TextAnalysis
      .crossDocDupGramFraction(dts(s, dir), n = 5)
      .msorted(col("doc_id"))

  /** End-to-end corpus-curation pipeline (x120): the four screens a
    * Common-Crawl-to-training-set pass runs, composed as ONE declarative
    * plan — exact dedup (min-id survivor per md5, the x01 rule) → Gopher
    * quality gate (x58's integer rule cascade, map-side over the same
    * rows) → language-identifiability screen (x05's marker argmax ≠
    * 'und') → per-source cap (x51's deterministic md5-ordered top-N, the
    * anti-single-source-domination quota) with x04's BPE-ish token count
    * carried for downstream budget accounting. Each stage is already
    * individually oracled; this surface certifies the COMPOSITION —
    * stage plumbing, filter ordering, and column flow — which is what an
    * actual pipeline run exercises. Delegates to [[graft.operators
    * .Curation.curate]] (shared with the CurationStream twin): map-side
    * screens FIRST (provably result-identical — see Curation's
    * screen-first equivalence — and they shrink the md5 exchange to the
    * passing subset), then the md5 dedup window and the source cap
    * window — two bounded shuffles, no joins, no collects.
    */
  protected def x120(s: SparkSession, dir: String): DataFrame =
    Curation
      .curate(dts(s, dir).select(col("doc_id"), col("source"), col("text")), cap = 10)
      .orderBy(col("source"), col("doc_id"))

  /** x64 merge count, shared between the Spark call and the generated
    * oracle so the two sides cannot drift. 64 per the r10 verdict: a
    * contract-demo m=3 was unconvincing as the tokenizer-prep operator;
    * at m=64 the chain reaches genuine multi-character subwords
    * ("order" appears whole by iter 64 at sf0.1) while the Spark side
    * stays at m+2 bounded driver jobs (see Bpe.learnMerges).
    */
  protected val bpeMerges = 64

  /** One unrolled BPE iteration of the x64 oracle (pair explode → weighted
    * count → (pc desc, pair) argmax → double-space literal replace), CTE
    * names indexed so [[bpeMerges]] of them chain — the x46 unrolled-
    * iteration technique. `win`/`w` are AS MATERIALIZED: each w_i is
    * referenced twice (pair scan + next replace), and at 64 chained
    * iterations DuckDB's default inlining re-expands the chain to the
    * base relation exponentially many times (observed: fd exhaustion on
    * the parquet view before any row moved); materialization makes the
    * oracle evaluate each iteration once, ~2 s at sf0.1.
    */
  protected def bpeIterSql(i: Int): String = {
    val prev = s"w${i - 1}"
    s"""p$i AS (
       |  SELECT unnest(CASE WHEN len(ts) >= 2
       |                     THEN [ts[j] || ' ' || ts[j+1] for j in range(1, len(ts))]
       |                     ELSE [] END) AS pair, cnt
       |  FROM (SELECT cnt, string_split_regex(trim(s), '\\s+') AS ts FROM $prev)
       |), g$i AS (
       |  SELECT pair, sum(cnt) AS pc FROM p$i GROUP BY pair
       |), win$i AS MATERIALIZED (
       |  SELECT pair, pc, string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b
       |  FROM g$i ORDER BY pc DESC, pair LIMIT 1
       |), w$i AS MATERIALIZED (
       |  -- LEFT JOIN ON TRUE, not CROSS JOIN: if the corpus exhausts
       |  -- mergeable pairs before iteration $i, win$i is empty and a cross
       |  -- join would EMPTY the word table — x64 correctly loses the iter
       |  -- row (matching Spark) but x65 must still see the full final word
       |  -- table, so s degrades to the previous iteration's s instead
       |  SELECT w, cnt,
       |    CASE WHEN a IS NULL THEN s
       |         ELSE replace(s, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') END AS s
       |  FROM $prev LEFT JOIN win$i ON TRUE
       |), after$i AS (
       |  SELECT sum(cnt * len(string_split_regex(trim(s), '\\s+'))) AS n FROM w$i
       |)""".stripMargin
  }

  /** Shared x60 CMS geometry, interpolated into BOTH the Spark call and
    * the DuckDB oracle so the two sides cannot drift.
    */
  protected val cmsDepth = 3
  protected val cmsWidth = 16

  protected lazy val curixQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x96_sentence_dedup" -> (x96 _),
    "x100_dsir_resample" -> (x100 _),
    "x101_anchor_text" -> (x101 _),
    "x102_sitemap" -> (x102 _),
    "x103_ccnet_buckets" -> (x103 _),
    "x105_curriculum" -> (x105 _),
    "x106_domain_stats" -> (x106 _),
    "x107_unimax_quotas" -> (x107 _),
    "x108_wordlist_filter" -> (x108 _),
    "x109_public_suffix" -> (x109 _),
    "x110_script_mix" -> (x110 _),
    "x114_max_shared_spans" -> (x114 _),
    "x116_dup_gram_profile" -> (x116 _),
    "x120_curation_pipeline" -> (x120 _),
    "x121_bpe_encode" -> (x121 _),
    "x122_remove_spans" -> (x122 _),
    "x123_fuzzy_editdist2" -> (x123 _),
    "x124_indexed_ingest_bucketed" -> (x124 _),
    "x51_source_cap" -> (x51 _),
    "x52_winsor_bounds" -> (x52 _),
    "x55_segment_dedup" -> (x55 _),
    "x57_kmv_distinct" -> (x57 _),
    "x58_gopher_rules" -> (x58 _),
    "x59_weighted_sample" -> (x59 _),
    "x60_cms_counts" -> (x60 _),
    "x61_collocations" -> (x61 _),
    "x62_binned_quantile" -> (x62 _),
    "x64_bpe_merges" -> (x64 _),
    "x65_bpe_segment" -> (x65 _),
    "x66_rendezvous_shard" -> (x66 _),
    "x67_incremental_ingest" -> (x67 _),
    "x68_burst_screen" -> (x68 _),
    "x70_lm_fluency" -> (x70 _),
    "x71_leakage_split" -> (x71 _),
    "x73_temp_quotas" -> (x73 _),
    "x74_winnow_fps" -> (x74 _),
    "x75_indexed_ingest" -> (x75 _),
    "x79_hll_distinct" -> (x79 _),
    "x83_rank_ppm" -> (x83 _),
    "x84_corpus_diff" -> (x84 _)
  )

  protected lazy val curixOracles: Map[String, String] = Map(
    // x123: brute-force levenshtein over the full value-pair square at
    // threshold 2 — the completeness certificate for the two-deletion
    // SymSpell blocking (any pair the blocking misses fails the hash).
    "x123_fuzzy_editdist2" ->
      """WITH v AS (SELECT DISTINCT p_name AS s FROM part
        |           WHERE p_name IS NOT NULL AND length(p_name) >= 2)
        |SELECT a.s AS a_val, b.s AS b_val,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM v a JOIN v b ON a.s < b.s
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY a_val, b_val""".stripMargin,
    "x51_source_cap" ->
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 30 ORDER BY source, doc_id""".stripMargin,
    "x52_winsor_bounds" ->
      """WITH b AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY event_type
        |)
        |SELECT e.event_type,
        |  round(min(b.lo), 6) AS lo, round(min(b.hi), 6) AS hi,
        |  count(*) FILTER (WHERE e.value < b.lo) AS n_below,
        |  count(*) FILTER (WHERE e.value > b.hi) AS n_above,
        |  count(*) AS n_total
        |FROM events e JOIN b USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // x55: same chunk CTE as x37 (window = stride = 8), keep-first by
    // (doc_id, chunk_idx) per distinct segment text, ordered reassembly;
    // string_agg skips the CASE-NULLed dropped segments, mirroring
    // concat_ws over kept-only rows. All counts CAST BIGINT (x17 lesson).
    "x55_segment_dedup" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), d AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |         CASE WHEN len(toks) <= 8 THEN 1
        |              ELSE (len(toks) - 8 + 7) // 8 + 1 END AS c
        |  FROM tk
        |), ch AS (
        |  SELECT doc_id, toks, n, unnest(range(c)) AS chunk_idx FROM d
        |), seg AS (
        |  SELECT doc_id, chunk_idx,
        |    array_to_string(list_slice(toks, chunk_idx * 8 + 1,
        |      chunk_idx * 8 + least(8, n - chunk_idx * 8)), ' ') AS chunk_text
        |  FROM ch
        |), k AS (
        |  SELECT *, row_number() OVER (PARTITION BY chunk_text
        |                               ORDER BY doc_id, chunk_idx) AS rk
        |  FROM seg
        |)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(count(*) FILTER (WHERE rk = 1) AS BIGINT) AS n_kept,
        |  CAST(count(*) FILTER (WHERE rk > 1) AS BIGINT) AS n_dropped,
        |  md5(coalesce(string_agg(CASE WHEN rk = 1 THEN chunk_text END,
        |                          ' ' ORDER BY chunk_idx), '')) AS dedup_md5
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // x57: hash = int of first 10 md5 hex chars (hex→int generated from
    // the same positional loop as the Spark side); k-minima via
    // row_number over DISTINCT hashes; estimate = (k-1)*2^40 // h_k in
    // BIGINT integer division. All outputs CAST BIGINT (x17 lesson).
    "x57_kmv_distinct" ->
      s"""WITH hx AS (
        |  SELECT DISTINCT event_type, substr(md5(CAST(user_id AS VARCHAR)), 1, 10) AS h
        |  FROM events WHERE user_id IS NOT NULL
        |), hv AS (
        |  SELECT event_type, CAST($kmvHexToIntSql AS BIGINT) AS v FROM hx
        |), r AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS nd
        |  FROM hv
        |), agg AS (
        |  SELECT event_type, nd,
        |    max(CASE WHEN rk = 64 THEN v END) AS kth
        |  FROM r GROUP BY event_type, nd
        |), ex AS (
        |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        |  FROM events GROUP BY event_type
        |)
        |SELECT a.event_type,
        |  CAST(least(a.nd, 64) AS BIGINT) AS n_tracked,
        |  CAST(a.kth AS BIGINT) AS kth_hash,
        |  CAST(CASE WHEN a.nd < 64 THEN a.nd
        |            ELSE ${63L * DistinctSketch.Domain} // greatest(a.kth, 1) END
        |       AS BIGINT) AS est_distinct,
        |  ex.exact_distinct
        |FROM agg a JOIN ex USING (event_type) ORDER BY event_type""".stripMargin,
    // x58: stopword list interpolated from the SAME Scala val as the
    // operator (TextAnalysis.langMarkers), so the two sides cannot drift;
    // all rule arithmetic integer, flags boolean on both engines.
    "x58_gopher_rules" ->
      s"""WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
        |), r AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_token_chars,
        |    CAST(len(list_intersect(toks,
        |      [${TextAnalysis.langMarkers.head._2.map(w => s"'$w'").mkString(",")}])) AS BIGINT) AS n_stopwords
        |  FROM tk
        |)
        |SELECT doc_id, n_tokens, sum_token_chars, n_stopwords,
        |  (n_tokens BETWEEN 30 AND 90) AS pass_count,
        |  (30 * n_tokens <= 10 * sum_token_chars
        |    AND 10 * sum_token_chars <= 52 * n_tokens) AS pass_meanlen,
        |  (n_stopwords >= 2) AS pass_stop,
        |  ((n_tokens BETWEEN 30 AND 90)
        |    AND 30 * n_tokens <= 10 * sum_token_chars
        |    AND 10 * sum_token_chars <= 52 * n_tokens
        |    AND n_stopwords >= 2) AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    // x59: integer sequential-Poisson priority = hex40(md5(doc_id)) //
    // weight, k smallest per lang; hex→int spliced from the x57 loop.
    "x59_weighted_sample" ->
      s"""WITH tk AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 10) AS h,
        |    md5(CAST(doc_id AS VARCHAR)) AS m
        |  FROM documents
        |), pr AS (
        |  SELECT doc_id, lang, w,
        |    CAST($kmvHexToIntSql AS BIGINT) // greatest(w, 1) AS priority, m
        |  FROM tk
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |                               ORDER BY priority, m, doc_id) AS rk
        |  FROM pr
        |)
        |SELECT lang, doc_id, w AS weight, CAST(priority AS BIGINT) AS priority
        |FROM r WHERE rk <= 30 ORDER BY lang, doc_id""".stripMargin,
    // x60: full CMS replay — rebuild every depth×width cell as the sum of
    // the exact counts of the tokens hashing there (the cell value IS the
    // number of increments), then take each token's min-of-depth cells;
    // row hash = hex40(md5(j || ':' || token)) mod width, spliced from the
    // same hex→int loop as x57. Geometry (depth, width) interpolated from
    // the same Scala vals as the Spark call.
    "x60_cms_counts" ->
      s"""WITH tk AS (
        |  SELECT string_split_regex(trim(text), '\\s+') AS toks FROM documents
        |), tok AS (
        |  SELECT unnest(toks) AS token FROM tk
        |), cnt AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt FROM tok GROUP BY token
        |), hj AS (
        |  SELECT token, exact_cnt, j,
        |    substr(md5(CAST(j AS VARCHAR) || ':' || token), 1, 10) AS h
        |  FROM cnt, range($cmsDepth) r(j)
        |), hv AS (
        |  SELECT token, exact_cnt, j, CAST($kmvHexToIntSql AS BIGINT) % $cmsWidth AS cell
        |  FROM hj
        |), cells AS (
        |  SELECT j, cell, sum(exact_cnt) AS c FROM hv GROUP BY j, cell
        |), est AS (
        |  SELECT hv.token, hv.exact_cnt, min(cells.c) AS est_cnt
        |  FROM hv JOIN cells ON hv.j = cells.j AND hv.cell = cells.cell
        |  GROUP BY hv.token, hv.exact_cnt
        |)
        |SELECT token, exact_cnt, CAST(est_cnt AS BIGINT) AS est_cnt,
        |  CAST(est_cnt - exact_cnt AS BIGINT) AS overestimate
        |FROM est ORDER BY token""".stripMargin,
    // x61: bigram/unigram counts by plain unnest + GROUP BY (the x38
    // ground-truth shape), then the same BIGINT lift arithmetic —
    // greatest(cnt-2,0)·N·1000 // (ca·cb) — so the phrase score is exact
    // on both engines; δ=2 / threshold 1300 match the Spark call.
    "x61_collocations" ->
      """WITH tk AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), g AS (
        |  SELECT unnest(CASE WHEN len(toks) >= 2
        |                     THEN [{'w1': toks[i], 'w2': toks[i+1]} for i in range(1, len(toks))]
        |                     ELSE [] END) AS p
        |  FROM tk
        |), pc AS (
        |  SELECT p.w1 AS w1, p.w2 AS w2, CAST(count(*) AS BIGINT) AS cnt_pair
        |  FROM g GROUP BY 1, 2
        |), u AS (
        |  SELECT unnest(toks) AS w FROM tk
        |), uc AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM u GROUP BY w
        |), lifts AS (
        |  SELECT pc.w1, pc.w2, cnt_pair,
        |    a.cnt AS cnt_w1, b.cnt AS cnt_w2,
        |    CAST(greatest(cnt_pair - 2, 0) * (SELECT sum(cnt) FROM uc) * 1000
        |         // (a.cnt * b.cnt) AS BIGINT) AS lift_x1000
        |  FROM pc JOIN uc a ON pc.w1 = a.w JOIN uc b ON pc.w2 = b.w
        |)
        |SELECT w1, w2, cnt_pair, cnt_w1, cnt_w2, lift_x1000,
        |  (lift_x1000 >= 1300) AS is_phrase
        |FROM lifts ORDER BY w1, w2""".stripMargin,
    // x62: ground truth for the histogram-refined selection is a plain
    // per-group sort — value at 0-based rank (p·(n−1)) // pDenom; the
    // refinement must land on exactly that element. Cents cast chain
    // matches x17's exact DECIMAL(18,2) route.
    "x62_binned_quantile" ->
      """WITH c AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM events
        |), r AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v) - 1 AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM c
        |)
        |SELECT event_type, 'p50' AS p_label, CAST(n AS BIGINT) AS n_total,
        |  CAST((n - 1) // 2 AS BIGINT) AS target_rank, v AS q_value
        |FROM r WHERE rn = (n - 1) // 2
        |UNION ALL
        |SELECT event_type, 'p95' AS p_label, CAST(n AS BIGINT) AS n_total,
        |  CAST(95 * (n - 1) // 100 AS BIGINT) AS target_rank, v AS q_value
        |FROM r WHERE rn = 95 * (n - 1) // 100
        |ORDER BY event_type, p_label""".stripMargin,
    // x64: three unrolled BPE iterations (bpeIterSql) over the word-count
    // table with the double-space canonical-merge encoding — literal
    // replace ≡ leftmost non-overlapping pair merge on both engines, so
    // merges, tie-breaks, weighted counts and corpus symbol totals replay
    // exactly. "left"/"right" quoted (reserved words in DuckDB).
    "x64_bpe_merges" ->
      (s"""WITH tk AS (
        |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
        |), wc AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tk WHERE length(w) > 0 GROUP BY w
        |), w0 AS MATERIALIZED (
        |  SELECT w, cnt, '  ' || array_to_string(string_split(w, ''), '  ') || '  ' AS s FROM wc
        |),""".stripMargin +
        (1 to bpeMerges).map(bpeIterSql).mkString(",") + "\n" +
        (1 to bpeMerges)
          .map(i =>
            s"""SELECT $i AS iter, a AS "left", b AS "right", a || b AS merged,
               |  CAST(pc AS BIGINT) AS pair_count,
               |  CAST((SELECT n FROM after$i) AS BIGINT) AS corpus_symbols_after
               |FROM win$i""".stripMargin)
          .mkString("\nUNION ALL\n") +
        "\nORDER BY iter"),
    // x65: the same unrolled chain's FINAL word table w{m} is already the
    // segmented vocabulary — train ≡ encode consistency by construction.
    "x65_bpe_segment" ->
      (s"""WITH tk AS (
        |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
        |), wc AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tk WHERE length(w) > 0 GROUP BY w
        |), w0 AS MATERIALIZED (
        |  SELECT w, cnt, '  ' || array_to_string(string_split(w, ''), '  ') || '  ' AS s FROM wc
        |),""".stripMargin +
        (1 to bpeMerges).map(bpeIterSql).mkString(",") + "\n" +
        s"""SELECT w, cnt,
           |  array_to_string(string_split_regex(trim(s), '\\s+'), ' ') AS segmentation,
           |  CAST(len(string_split_regex(trim(s), '\\s+')) AS BIGINT) AS n_subwords
           |FROM w$bpeMerges ORDER BY w""".stripMargin),
    // x121: the x64/x65 unrolled chain extended three CTEs — vocab ids by
    // (weighted count desc, symbol asc) over the final word table,
    // (doc, pos, word) via DuckDB's parallel unnest (zip) with 0-based
    // positions over the RAW split (empties filtered after indexing,
    // matching the Spark side), segmentation re-split with sub positions,
    // id join. train ≡ segment ≡ encode in one replay.
    "x121_bpe_encode" ->
      (s"""WITH tk AS (
        |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
        |), wc AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tk WHERE length(w) > 0 GROUP BY w
        |), w0 AS MATERIALIZED (
        |  SELECT w, cnt, '  ' || array_to_string(string_split(w, ''), '  ') || '  ' AS s FROM wc
        |),""".stripMargin +
        (1 to bpeMerges).map(bpeIterSql).mkString(",") + "," +
        s"""
        |fin AS MATERIALIZED (
        |  SELECT w, cnt, string_split_regex(trim(s), '\\s+') AS syms FROM w$bpeMerges
        |), vocab AS MATERIALIZED (
        |  SELECT sym, row_number() OVER (ORDER BY c DESC, sym) - 1 AS token_id
        |  FROM (SELECT sym, sum(cnt) AS c
        |        FROM (SELECT cnt, unnest(syms) AS sym FROM fin) GROUP BY sym)
        |), dtk AS (
        |  SELECT doc_id, w, pos FROM (
        |    SELECT doc_id, unnest(ts) AS w, unnest(range(len(ts))) AS pos
        |    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents))
        |  WHERE length(w) > 0
        |), enc AS (
        |  SELECT d.doc_id, d.pos, unnest(f.syms) AS sym, unnest(range(len(f.syms))) AS sub_pos
        |  FROM dtk d JOIN fin f USING (w)
        |)
        |SELECT e.doc_id, CAST(e.pos AS INT) AS pos, CAST(e.sub_pos AS INT) AS sub_pos,
        |  CAST(v.token_id AS BIGINT) AS token_id
        |FROM enc e JOIN vocab v USING (sym)
        |ORDER BY e.doc_id, pos, sub_pos""".stripMargin),
    // x66: all 8 rendezvous weights per doc via the x57 hex→int splice,
    // argmax by (weight desc, shard asc) — the operator's first-position
    // tie-break in window form.
    "x66_rendezvous_shard" ->
      s"""WITH d AS (
        |  SELECT doc_id FROM documents
        |), hx AS (
        |  SELECT doc_id, sh,
        |    substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(sh AS VARCHAR)), 1, 10) AS h
        |  FROM d, range($hrwShards) r(sh)
        |), hv AS (
        |  SELECT doc_id, sh, CAST($kmvHexToIntSql AS BIGINT) AS wgt FROM hx
        |), rk AS (
        |  SELECT doc_id, sh, wgt,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY wgt DESC, sh) AS rn
        |  FROM hv
        |)
        |SELECT doc_id, CAST(sh AS INTEGER) AS shard, wgt AS shard_weight
        |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // x67: brute-force ground truth — digest join for exact, all-pairs
    // distinct-3-shingle Jaccard (the x06 convention) for near, CASE
    // precedence exact > near > novel, min match id per class.
    "x67_incremental_ingest" ->
      """WITH idx AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 250
        |), newb AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 250
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20
        |), ex AS (
        |  SELECT n.doc_id, min(i.doc_id) AS m
        |  FROM newb n JOIN idx i ON md5(n.text) = md5(i.text) GROUP BY n.doc_id
        |), shn AS (
        |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                                for i in range(1, len(t) - 1)]) AS sh
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM newb)
        |  WHERE len(t) >= 3
        |), shi AS (
        |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                                for i in range(1, len(t) - 1)]) AS sh
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM idx)
        |  WHERE len(t) >= 3
        |), nr AS (
        |  SELECT a.doc_id, min(b.doc_id) AS m
        |  FROM shn a JOIN shi b ON
        |    len(list_intersect(a.sh, b.sh)) * 1.0
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
        |  GROUP BY a.doc_id
        |)
        |SELECT n.doc_id,
        |  CASE WHEN ex.m IS NOT NULL THEN 'exact'
        |       WHEN nr.m IS NOT NULL THEN 'near'
        |       ELSE 'novel' END AS status,
        |  coalesce(ex.m, nr.m) AS match_id
        |FROM newb n LEFT JOIN ex ON n.doc_id = ex.doc_id
        |LEFT JOIN nr ON n.doc_id = nr.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    // x79: replay the HLL register file and exact-integer estimator —
    // hash40 (kmv hex→int splice), top-6-bit bucket, rho = 35 − bitlen of
    // the 34-bit remainder capped at 31, register = max rho, absent
    // buckets 0 via the 64-slot grid, S = Σ 2^(R−Mj), est = α_ppm·m²·2^R
    // div (10⁶·S), every step BIGINT.
    "x79_hll_distinct" ->
      s"""WITH tk AS (
        |  SELECT source, string_split_regex(trim(text), '\\s+') AS t FROM documents
        |), gr AS (
        |  SELECT source, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                         for i in range(1, len(t) - 1)]) AS tok
        |  FROM tk WHERE len(t) >= 3
        |), dt AS (
        |  SELECT DISTINCT source, tok FROM gr
        |), hx AS (
        |  SELECT source, substr(md5(tok), 1, 10) AS h FROM dt
        |), hv AS (
        |  SELECT source, CAST($kmvHexToIntSql AS BIGINT) AS v FROM hx
        |), br AS (
        |  SELECT source, v // 17179869184 AS j,
        |    CASE WHEN v % 17179869184 = 0 THEN 31
        |         ELSE least(35 - length(bin(v % 17179869184)), 31) END AS rho
        |  FROM hv
        |), mreg AS (
        |  SELECT source, j, max(rho) AS mj FROM br GROUP BY source, j
        |), grid AS (
        |  -- source domain from gr, NOT documents: a source whose every doc
        |  -- tokenizes below 3 tokens never forms a group on the Spark side
        |  -- (explode of empty shingle arrays drops the rows), so it must
        |  -- not materialize an all-zero register row here either
        |  SELECT s.source, g.j, coalesce(mreg.mj, 0) AS mj
        |  FROM (SELECT DISTINCT source FROM gr) s
        |  CROSS JOIN (SELECT unnest(range(64)) AS j) g
        |  LEFT JOIN mreg ON mreg.source = s.source AND mreg.j = g.j
        |), rm AS (
        |  SELECT source, max(mj) AS r_max FROM grid GROUP BY source
        |), agg AS (
        |  SELECT grid.source, CAST(max(mj) AS INT) AS r_max,
        |    CAST(sum(CAST(1 AS BIGINT) << (rm.r_max - mj)) AS BIGINT) AS s_scaled,
        |    CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_regs
        |  FROM grid JOIN rm ON grid.source = rm.source GROUP BY grid.source
        |)
        |SELECT source, r_max, s_scaled, n_zero_regs,
        |  CAST((CAST(709265 AS BIGINT) * 4096 * (CAST(1 AS BIGINT) << r_max))
        |       // (CAST(1000000 AS BIGINT) * s_scaled) AS BIGINT) AS est_distinct
        |FROM agg ORDER BY source""".stripMargin,
    // x96: replay the same first-occurrence sentence dedup - split on
    // '. ', keep each sentence's minimum index, rebuild in index order.
    // The oracle runs the ALGORITHM (min-index window), not the plant.
    "x96_sentence_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text || '. ' || text AS t2
        |  FROM documents WHERE doc_id % 4 = 1
        |), s AS (
        |  SELECT doc_id, unnest(string_split(t2, '. ')) AS sent,
        |    generate_subscripts(string_split(t2, '. '), 1) AS i
        |  FROM d
        |), f AS (
        |  SELECT doc_id, sent, i,
        |    min(i) OVER (PARTITION BY doc_id, sent) AS fi
        |  FROM s
        |), tot AS (
        |  SELECT doc_id, count(*) AS n_sent FROM s GROUP BY doc_id
        |), kept AS (
        |  SELECT doc_id, string_agg(sent, '. ' ORDER BY i) AS clean_text,
        |    count(*) AS n_kept
        |  FROM f WHERE i = fi GROUP BY doc_id
        |)
        |SELECT t.doc_id, k.clean_text,
        |  CAST(t.n_sent AS INT) AS n_sent,
        |  CAST(t.n_sent - k.n_kept AS INT) AS n_dupes
        |FROM tot t JOIN kept k ON t.doc_id = k.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // x110: every class re-counted with an independent RE2 regex over
    // the same injected text (replay by different machinery).
    "x110_script_mix" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 1 THEN text || ' привет мир всем'
        |         WHEN doc_id % 4 = 2 THEN text || ' 你好世界'
        |         WHEN doc_id % 4 = 3 THEN text || ' mixed привет 你好'
        |         ELSE text END AS t
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_replace(t, '[^A-Za-z]', '', 'g')) AS INT) AS n_latin,
        |    CAST(len(regexp_replace(t, '[^\x{0400}-\x{04FF}]', '', 'g')) AS INT) AS n_cyrillic,
        |    CAST(len(regexp_replace(t, '[^\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]', '', 'g')) AS INT) AS n_cjk,
        |    CAST(len(regexp_replace(t, '[^0-9]', '', 'g')) AS INT) AS n_digit,
        |    CAST(len(t) - len(regexp_replace(t, '\s', '', 'g')) AS INT) AS n_space,
        |    CAST(len(t) AS INT) AS n_all
        |  FROM d
        |)
        |SELECT doc_id, n_latin, n_cyrillic, n_cjk, n_digit, n_space,
        |  n_all - n_latin - n_cyrillic - n_cjk - n_digit - n_space AS n_other,
        |  CASE
        |    WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk AND n_latin > 0 THEN 'latin'
        |    WHEN n_cyrillic >= n_cjk AND n_cyrillic > 0 THEN 'cyrillic'
        |    WHEN n_cjk > 0 THEN 'cjk'
        |    ELSE 'none'
        |  END AS dominant,
        |  (CASE WHEN n_latin > 0 THEN 1 ELSE 0 END
        |   + CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END
        |   + CASE WHEN n_cjk > 0 THEN 1 ELSE 0 END) >= 2 AS mixed
        |FROM c ORDER BY doc_id""".stripMargin,
    // x114: stride-1 8-token gram digests, the diagonal join, and the
    // island arithmetic replayed verbatim — the planted append/prepend
    // spans land at different offsets by construction, and the corpus's
    // organic 8-gram repeats ride along.
    "x114_max_shared_spans" ->
      s"""WITH d0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 37 = 0 THEN text || ' $spanInj'
        |         WHEN doc_id % 41 = 0 THEN '$spanInj ' || text
        |         ELSE text END AS text
        |  FROM documents
        |), tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM d0
        |), g AS (
        |  SELECT doc_id, i - 1 AS p,
        |    md5(array_to_string(toks[i:i+7], ' ')) AS h
        |  FROM tk, LATERAL unnest(range(1, len(toks) - 6)) t(i)
        |  WHERE len(toks) >= 8
        |), m AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.p AS pa, b.p AS pb
        |  FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id
        |), isl AS (
        |  SELECT a_id, b_id, pa - pb AS dg, pa, pb,
        |    pa - row_number() OVER (
        |      PARTITION BY a_id, b_id, pa - pb ORDER BY pa) AS k
        |  FROM m
        |)
        |SELECT a_id, b_id,
        |  CAST(min(pa) AS BIGINT) AS a_start,
        |  CAST(min(pb) AS BIGINT) AS b_start,
        |  CAST(count(*) + 7 AS BIGINT) AS span_tokens
        |FROM isl GROUP BY a_id, b_id, dg, k
        |ORDER BY a_id, b_id, a_start, b_start""".stripMargin,
    // x122: x114's replay extended with the losing-interval islands merge
    // (running-max window, overlapping spans fuse), a parallel-unnest
    // token rebuild with 0-based positions, and the anti-join cut — the
    // find ≡ remove consistency chain.
    "x122_remove_spans" ->
      s"""WITH d0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 37 = 0 THEN text || ' $spanInj'
        |         WHEN doc_id % 41 = 0 THEN '$spanInj ' || text
        |         ELSE text END AS text
        |  FROM documents
        |), tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM d0
        |), g AS (
        |  SELECT doc_id, i - 1 AS p,
        |    md5(array_to_string(toks[i:i+7], ' ')) AS h
        |  FROM tk, LATERAL unnest(range(1, len(toks) - 6)) t(i)
        |  WHERE len(toks) >= 8
        |), m AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.p AS pa, b.p AS pb
        |  FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id
        |), isl AS (
        |  SELECT a_id, b_id, pa - pb AS dg, pa, pb,
        |    pa - row_number() OVER (
        |      PARTITION BY a_id, b_id, pa - pb ORDER BY pa) AS k
        |  FROM m
        |), sp AS (
        |  SELECT b_id AS doc_id,
        |    CAST(min(pb) AS BIGINT) AS s,
        |    CAST(min(pb) + count(*) + 7 AS BIGINT) AS e
        |  FROM isl GROUP BY a_id, b_id, dg, k
        |), mg AS (
        |  SELECT doc_id, s, e,
        |    CASE WHEN s > coalesce(max(e) OVER (
        |        PARTITION BY doc_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      THEN 1 ELSE 0 END AS ni
        |  FROM sp
        |), mg2 AS (
        |  SELECT doc_id, s, e,
        |    sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e
        |                  ROWS UNBOUNDED PRECEDING) AS isl2
        |  FROM mg
        |), iv AS (
        |  SELECT doc_id, min(s) AS s, max(e) AS e FROM mg2 GROUP BY doc_id, isl2
        |), pos AS (
        |  SELECT doc_id, unnest(toks) AS t, unnest(range(len(toks))) AS i FROM tk
        |), kept AS (
        |  SELECT p.doc_id, p.t, p.i FROM pos p
        |  WHERE NOT EXISTS (SELECT 1 FROM iv
        |                    WHERE iv.doc_id = p.doc_id AND p.i >= iv.s AND p.i < iv.e)
        |), kept2 AS (
        |  SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS clean_text,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT tk.doc_id, coalesce(k.clean_text, '') AS clean_text,
        |  CAST(len(tk.toks) AS BIGINT) AS n_tokens,
        |  CAST(len(tk.toks) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed_tokens
        |FROM tk LEFT JOIN kept2 k USING (doc_id)
        |ORDER BY tk.doc_id""".stripMargin,
    // x116: distinct 5-gram shingles, document-frequency table, df>=2
    // rollup, floor-ppm — the same algorithm by different machinery.
    "x116_dup_gram_profile" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 5 THEN
        |      list_distinct([array_to_string(toks[i:i+4], ' ')
        |                     for i in range(1, len(toks) - 3)])
        |    ELSE [] END AS sh
        |  FROM tk
        |), p AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM g
        |), dfx AS (
        |  SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY shingle
        |), dup AS (
        |  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_dup
        |  FROM p JOIN dfx ON p.shingle = dfx.shingle WHERE dfx.df >= 2
        |  GROUP BY p.doc_id
        |)
        |SELECT g.doc_id, CAST(len(sh) AS BIGINT) AS n_grams,
        |  coalesce(n_dup, 0) AS n_dup,
        |  CASE WHEN len(sh) > 0
        |    THEN coalesce(n_dup, 0) * 1000000 // len(sh) ELSE -1 END AS dup_ppm
        |FROM g LEFT JOIN dup ON g.doc_id = dup.doc_id
        |ORDER BY g.doc_id""".stripMargin,
    // x120: the composed curation pipeline replayed stage by stage —
    // x01's dedup rule, x58's integer Gopher cascade, x05's marker
    // argmax, x51's md5-ordered cap, x04's BPE-ish count — each CTE the
    // same text its standalone oracle uses, so the composition cannot
    // drift from the pieces.
    "x120_curation_pipeline" ->
      s"""WITH surv AS (
        |  SELECT doc_id, source, text,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents
        |), s1 AS (
        |  SELECT doc_id, source, text FROM surv WHERE rn = 1
        |), tk AS (
        |  SELECT doc_id, source, text,
        |    string_split_regex(trim(text), '\\s+') AS toks FROM s1
        |), g AS (
        |  SELECT *,
        |    CAST(len(toks) AS BIGINT) AS n_tok,
        |    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_chars,
        |    CAST(len(list_intersect(toks,
        |      [${TextAnalysis.langMarkers.head._2.map(w => s"'$w'").mkString(",")}])) AS BIGINT) AS n_stop
        |  FROM tk
        |), q AS (
        |  SELECT * FROM g
        |  WHERE n_tok BETWEEN 30 AND 90
        |    AND 30 * n_tok <= 10 * sum_chars AND 10 * sum_chars <= 52 * n_tok
        |    AND n_stop >= 2
        |), sc AS (
        |  SELECT *,
        |    len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a'], t))) AS s_en,
        |    len(list_filter(toks, t -> list_contains(['el','los','de','y','que','en','una'], t))) AS s_es,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS s_de,
        |    len(list_filter(toks, t -> list_contains(['le','les','des','et','est','une','dans'], t))) AS s_fr
        |  FROM q
        |), lang AS (
        |  SELECT *, CASE
        |    WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        |    WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
        |    WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
        |    WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
        |    ELSE 'fr' END AS lang_pred
        |  FROM sc
        |), fin AS (
        |  SELECT * FROM lang WHERE lang_pred <> 'und'
        |), capd AS (
        |  SELECT source, doc_id, lang_pred,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens,
        |    row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
        |  FROM fin
        |)
        |SELECT source, doc_id, lang_pred, n_tokens
        |FROM capd WHERE rn <= 10 ORDER BY source, doc_id""".stripMargin,
    // x109: expected outputs hand-derived from the PSL spec per rule
    // kind, written closed-form — an independent derivation, not a
    // replay of the engine's join.
    "x109_public_suffix" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(doc_id % 5 AS VARCHAR) AS k
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'www.example' || k || '.com'
        |    WHEN 1 THEN 'a.b.example' || k || '.co.uk'
        |    WHEN 2 THEN 'www.user' || k || '.github.io'
        |    WHEN 3 THEN 'a.b' || k || '.ck'
        |    WHEN 4 THEN 'www.ck'
        |    ELSE CASE WHEN doc_id % 12 = 5 THEN 'co.uk'
        |              ELSE 'internal' || k || '.unknown' END
        |  END AS host,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'com'
        |    WHEN 1 THEN 'co.uk'
        |    WHEN 2 THEN 'github.io'
        |    WHEN 3 THEN 'b' || k || '.ck'
        |    WHEN 4 THEN 'ck'
        |    ELSE CASE WHEN doc_id % 12 = 5 THEN 'co.uk' ELSE 'unknown' END
        |  END AS public_suffix,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'example' || k || '.com'
        |    WHEN 1 THEN 'example' || k || '.co.uk'
        |    WHEN 2 THEN 'user' || k || '.github.io'
        |    WHEN 3 THEN 'a.b' || k || '.ck'
        |    WHEN 4 THEN 'www.ck'
        |    ELSE CASE WHEN doc_id % 12 = 5 THEN NULL
        |              ELSE 'internal' || k || '.unknown' END
        |  END AS registrable
        |FROM d ORDER BY doc_id""".stripMargin,
    // x108: identical fold chain (lower → translate → letter-run split)
    // and the same injection CASE, hit counting via list_filter.
    "x108_wordlist_filter" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' w1n a pr1ze at the c4$ino'
        |         WHEN doc_id % 3 = 1 THEN text || ' free l0ttery t1cket'
        |         ELSE text END AS t
        |  FROM documents
        |), f AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(regexp_replace(
        |      translate(lower(t), '013457@$', 'oieastas'),
        |      '[^a-z]+', ' ', 'g')), '\s+') AS toks
        |  FROM d
        |), h AS (
        |  SELECT doc_id,
        |    list_filter(toks, w -> list_contains(
        |      ['casino', 'lottery', 'prize', 'winner', 'free'], w)) AS hits
        |  FROM f
        |)
        |SELECT doc_id,
        |  CAST(len(hits) AS INT) AS n_hits,
        |  CAST(len(list_distinct(hits)) AS INT) AS n_distinct_hits,
        |  CASE WHEN len(hits) > 0 THEN list_sort(hits)[1] END AS first_hit,
        |  len(hits) >= 2 AS flagged
        |FROM h ORDER BY doc_id""".stripMargin,
    // x107: the waterfill replayed in SQL windows over the per-language
    // table — same sort, same prefix predicate, same remainder split.
    "x107_unimax_quotas" ->
      """WITH tk AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), lid AS (
        |  SELECT CAST(len(toks) AS BIGINT) AS n_tok,
        |    len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a'], t))) AS s_en,
        |    len(list_filter(toks, t -> list_contains(['el','los','de','y','que','en','una'], t))) AS s_es,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS s_de,
        |    len(list_filter(toks, t -> list_contains(['le','les','des','et','est','une','dans'], t))) AS s_fr
        |  FROM tk
        |), dl AS (
        |  SELECT CASE
        |      WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        |      WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
        |      WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
        |      WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
        |      ELSE 'fr'
        |    END AS lang, n_tok
        |  FROM lid
        |), pl AS (
        |  SELECT lang, CAST(sum(n_tok) AS BIGINT) AS n_tok
        |  FROM dl GROUP BY lang
        |), srt AS (
        |  SELECT lang, n_tok, n_tok AS cap,
        |    row_number() OVER (ORDER BY n_tok, lang) AS j,
        |    CAST(sum(n_tok) OVER
        |      (ORDER BY n_tok, lang ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s,
        |    count(*) OVER () AS l,
        |    CAST((SELECT sum(n_tok) // 2 FROM pl) AS BIGINT) AS b
        |  FROM pl
        |), fl AS (
        |  SELECT *, cap * (l - j + 1) <= b - (s - cap) AS sat FROM srt
        |), ag AS (
        |  SELECT CAST(coalesce(sum(CASE WHEN sat THEN cap END), 0) AS BIGINT) AS satsum,
        |    CAST(coalesce(sum(CASE WHEN sat THEN 1 END), 0) AS BIGINT) AS m
        |  FROM fl
        |), un AS (
        |  SELECT lang, row_number() OVER (ORDER BY cap, lang) AS r
        |  FROM fl WHERE NOT sat
        |), q AS (
        |  SELECT f.lang, f.n_tok, f.cap, f.sat,
        |    CASE WHEN f.sat THEN f.cap
        |      ELSE (f.b - ag.satsum) // greatest(f.l - ag.m, 1)
        |        + CASE WHEN u.r <= (f.b - ag.satsum) % greatest(f.l - ag.m, 1)
        |            THEN 1 ELSE 0 END
        |    END AS quota
        |  FROM fl f LEFT JOIN un u USING (lang), ag
        |)
        |SELECT lang, n_tok, CAST(cap AS BIGINT) AS cap,
        |  CAST(quota AS BIGINT) AS quota,
        |  CAST(CASE WHEN n_tok > 0 THEN quota * 1000000 // n_tok ELSE 0 END
        |    AS BIGINT) AS keep_ppm,
        |  sat AS saturated
        |FROM q ORDER BY lang""".stripMargin,
    // x106: hosts written closed-form (normalization defects become
    // key mismatches), x05 lang argmax, then count/sum rollup with
    // row_number plurality and the integer-div block rule.
    "x106_domain_stats" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN 'example' || CAST(doc_id % 5 AS VARCHAR) || '.com'
        |      ELSE 'sub' || CAST(doc_id % 7 AS VARCHAR) || '.example'
        |        || CAST(doc_id % 5 AS VARCHAR) || '.com' END AS host,
        |    string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), lg AS (
        |  SELECT doc_id, host,
        |    CAST(len(toks) AS BIGINT) AS n_tok,
        |    len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a'], t))) AS s_en,
        |    len(list_filter(toks, t -> list_contains(['el','los','de','y','que','en','una'], t))) AS s_es,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS s_de,
        |    len(list_filter(toks, t -> list_contains(['le','les','des','et','est','une','dans'], t))) AS s_fr
        |  FROM d
        |), dl AS (
        |  SELECT host,
        |    CASE
        |      WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        |      WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
        |      WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
        |      WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
        |      ELSE 'fr'
        |    END AS lang, n_tok
        |  FROM lg
        |), ct AS (
        |  SELECT host, lang, count(*) AS cnt, sum(n_tok) AS tok
        |  FROM dl GROUP BY 1, 2
        |), top AS (
        |  SELECT host, lang,
        |    row_number() OVER (PARTITION BY host ORDER BY cnt DESC, lang) AS rn
        |  FROM ct
        |), agg AS (
        |  SELECT host, sum(cnt) AS n_docs, sum(tok) AS tok_sum
        |  FROM ct GROUP BY host
        |)
        |SELECT a.host, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(tok_sum AS BIGINT) AS tok_sum,
        |  CAST(tok_sum // n_docs AS BIGINT) AS avg_tok,
        |  t.lang AS top_lang,
        |  (tok_sum // n_docs) < 54 AS blocked
        |FROM agg a JOIN top t ON a.host = t.host AND t.rn = 1
        |ORDER BY a.host""".stripMargin,
    // x105: the definitional double-window replay of the closed-form
    // interleave — per-source row_number, then global row_number over
    // (rank, source).
    "x105_curriculum" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'src_a' WHEN 1 THEN 'src_b'
        |      ELSE 'src_c' END AS source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(row_number() OVER
        |      (PARTITION BY source ORDER BY n_tok, doc_id) AS BIGINT) AS src_rank
        |  FROM d
        |)
        |SELECT doc_id, source, n_tok, src_rank,
        |  CAST(row_number() OVER (ORDER BY src_rank, source) AS BIGINT) AS pos
        |FROM r ORDER BY doc_id""".stripMargin,
    // x103: the x05 language argmax + the full x70 LM replay on the odd
    // half, then literal ntile(3)/row_number per language — DuckDB's
    // ntile IS the SQL semantics GroupNtile's closed form reproduces, so
    // a hash match proves the class-table rank decomposition exactly.
    "x103_ccnet_buckets" ->
      """WITH rtk AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE doc_id % 2 = 0
        |), uni AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt_w
        |  FROM (SELECT unnest(toks) AS w FROM rtk) GROUP BY w
        |), big AS (
        |  SELECT p['w1'] AS w1, p['w2'] AS w2, CAST(count(*) AS BIGINT) AS cnt_b
        |  FROM (
        |    SELECT unnest(CASE WHEN len(toks) >= 2
        |      THEN [{'w1': toks[i], 'w2': toks[i+1]} for i in range(1, len(toks))]
        |      ELSE [] END) AS p
        |    FROM rtk)
        |  GROUP BY 1, 2
        |), n AS (
        |  SELECT greatest(CAST(coalesce(sum(cnt_w), 0) AS BIGINT), 1) AS total FROM uni
        |), ttk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE doc_id % 2 = 1
        |), pd AS (
        |  SELECT doc_id, p['w1'] AS w1, p['w2'] AS w2, CAST(count(*) AS BIGINT) AS m
        |  FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |      THEN [{'w1': toks[i], 'w2': toks[i+1]} for i in range(1, len(toks))]
        |      ELSE [] END) AS p
        |    FROM ttk)
        |  GROUP BY 1, 2, 3
        |), sc AS (
        |  SELECT pd.doc_id, pd.m,
        |    CASE WHEN b.cnt_b IS NOT NULL THEN b.cnt_b * 1000000 // u1.cnt_w
        |         ELSE coalesce(u2.cnt_w, 0) * 400000 // n.total END AS p_ppm
        |  FROM pd
        |  LEFT JOIN big b ON pd.w1 = b.w1 AND pd.w2 = b.w2
        |  LEFT JOIN uni u1 ON pd.w1 = u1.w
        |  LEFT JOIN uni u2 ON pd.w2 = u2.w, n
        |), flu AS (
        |  SELECT doc_id, CAST(sum(m * p_ppm) // sum(m) AS BIGINT) AS f
        |  FROM sc GROUP BY doc_id
        |), lid AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a'], t))) AS s_en,
        |    len(list_filter(toks, t -> list_contains(['el','los','de','y','que','en','una'], t))) AS s_es,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS s_de,
        |    len(list_filter(toks, t -> list_contains(['le','les','des','et','est','une','dans'], t))) AS s_fr
        |  FROM ttk
        |), joined AS (
        |  SELECT l.doc_id,
        |    CASE
        |      WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        |      WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
        |      WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
        |      WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
        |      ELSE 'fr'
        |    END AS lang,
        |    CAST(coalesce(f, -1) AS BIGINT) AS fluency_ppm
        |  FROM lid l LEFT JOIN flu USING (doc_id)
        |)
        |SELECT doc_id, lang, fluency_ppm,
        |  CAST(row_number() OVER
        |    (PARTITION BY lang ORDER BY fluency_ppm DESC, doc_id) AS BIGINT) AS lrank,
        |  CASE ntile(3) OVER
        |    (PARTITION BY lang ORDER BY fluency_ppm DESC, doc_id)
        |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM joined ORDER BY doc_id""".stripMargin,
    // x102: closed-form rebuild of every sitemap entry — the decoded /
    // trimmed / ppm-parsed VALUES are written directly, so any walk
    // defect (entity leak, CDATA padding, wrong omission) hash-fails.
    "x102_sitemap" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) AS ids,
        |    CAST(doc_id % 5 AS VARCHAR) AS k
        |  FROM documents WHERE doc_id % 5 = 2
        |), idx AS (
        |  SELECT * FROM d WHERE doc_id % 4 = 0
        |), us AS (
        |  SELECT * FROM d WHERE doc_id % 4 <> 0
        |), rows_ AS (
        |  SELECT doc_id, 0 AS entry_idx, 'sitemap' AS kind,
        |    'https://example' || k || '.com/sitemap_' || ids || '_1.xml' AS loc,
        |    '2024-06-0' || CAST(1 + doc_id % 9 AS VARCHAR) AS lastmod,
        |    CAST(NULL AS VARCHAR) AS changefreq,
        |    CAST(NULL AS INT) AS priority_ppm
        |  FROM idx
        |  UNION ALL
        |  SELECT doc_id, 1, 'sitemap',
        |    'https://example' || k || '.com/sitemap_' || ids || '_2.xml',
        |    NULL, NULL, NULL
        |  FROM idx
        |  UNION ALL
        |  SELECT doc_id, 0, 'url',
        |    'https://example' || k || '.com/p/' || ids,
        |    CASE WHEN doc_id % 3 <> 0 THEN
        |      '2024-' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0')
        |      || '-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') END,
        |    CASE doc_id % 3 WHEN 1 THEN 'weekly' WHEN 2 THEN 'monthly' END,
        |    CASE WHEN doc_id % 3 <> 0
        |      THEN CAST((doc_id % 10) * 100000 AS INT) END
        |  FROM us
        |  UNION ALL
        |  SELECT doc_id, 1, 'url',
        |    'https://example' || k || '.com/s?a=' || ids
        |      || '&b=' || CAST(doc_id % 7 AS VARCHAR),
        |    NULL, NULL, 500000
        |  FROM us
        |  UNION ALL
        |  SELECT doc_id, 2, 'url',
        |    'https://example' || k || '.com/cd/' || ids,
        |    '2024-01-02', NULL, NULL
        |  FROM us
        |)
        |SELECT doc_id, CAST(entry_idx AS INT) AS entry_idx, kind, loc,
        |  lastmod, changefreq, CAST(priority_ppm AS INT) AS priority_ppm
        |FROM rows_ ORDER BY doc_id, entry_idx""".stripMargin,
    // x101: closed-form pair stream (5 page anchors + the hub re-link
    // under "site {id%5}") → per-(target, text) counts → row_number
    // plurality with (cnt desc, text) tie-break → per-target totals.
    "x101_anchor_text" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) AS ids,
        |    CAST(doc_id % 13 AS VARCHAR) AS k,
        |    'site ' || CAST(doc_id % 5 AS VARCHAR) AS st
        |  FROM documents WHERE doc_id % 2 = 0
        |), pairs AS (
        |  SELECT doc_id, '/p/' || ids AS href, 'nav item ' || ids AS txt FROM d
        |  UNION ALL SELECT doc_id, '/q/' || k, 'more links here' FROM d
        |  UNION ALL SELECT doc_id, '/ref/' || ids, 'ref ' || ids FROM d
        |  UNION ALL SELECT doc_id, '/about', 'about' FROM d
        |  UNION ALL SELECT doc_id, '/tos', 'terms' FROM d
        |  UNION ALL SELECT doc_id, '/q/' || k, st FROM d
        |), ct AS (
        |  SELECT href, txt, count(*) AS cnt FROM pairs GROUP BY href, txt
        |), top AS (
        |  SELECT href, txt, cnt,
        |    row_number() OVER (PARTITION BY href ORDER BY cnt DESC, txt) AS rn
        |  FROM ct
        |), agg AS (
        |  SELECT href, count(*) AS n_links,
        |    count(DISTINCT doc_id) AS n_src_docs,
        |    count(DISTINCT txt) AS n_texts
        |  FROM pairs GROUP BY href
        |)
        |SELECT a.href AS target, CAST(n_links AS BIGINT) AS n_links,
        |  CAST(n_src_docs AS BIGINT) AS n_src_docs,
        |  CAST(n_texts AS BIGINT) AS n_texts,
        |  t.txt AS top_text, CAST(t.cnt AS BIGINT) AS top_cnt
        |FROM agg a JOIN top t ON a.href = t.href AND t.rn = 1
        |ORDER BY target""".stripMargin,
    // x100: full DSIR replay — md5-hex4 feature buckets (positional
    // strpos decode, the kmv convention), ONE grouped count carrying both
    // distributions, add-one-smoothed integer ratio weights over the FULL
    // bucket range, occurrence-sum scores for the raw pool, row_number
    // under (score desc, doc_id) and the top-n_raw//5 keep rule.
    "x100_dsir_resample" ->
      s"""WITH tk AS (
        |  SELECT doc_id, doc_id % 7 = 0 AS tgt,
        |    unnest(string_split_regex(trim(text), '\\s+')) AS tok
        |  FROM documents
        |), hx AS (
        |  SELECT doc_id, tgt, md5(tok) AS h FROM tk WHERE tok <> ''
        |), f AS (
        |  SELECT doc_id, tgt, ($hex4ToIntSql) % 256 AS b FROM hx
        |), cnt AS (
        |  SELECT b,
        |    sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS t,
        |    sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS r
        |  FROM f GROUP BY b
        |), w AS (
        |  SELECT bb.b,
        |    ((coalesce(t, 0) + 1) * 1000000) // (coalesce(r, 0) + 1) AS w
        |  FROM (SELECT unnest(range(0, 256)) AS b) bb
        |  LEFT JOIN cnt ON bb.b = cnt.b
        |), sc AS (
        |  SELECT doc_id, count(*) AS n_tok, sum(w) AS score
        |  FROM f JOIN w USING (b) WHERE NOT tgt GROUP BY doc_id
        |), n AS (
        |  SELECT count(*) AS n_raw FROM sc
        |), rk AS (
        |  SELECT doc_id, n_tok, score,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM sc
        |)
        |SELECT doc_id, CAST(n_tok AS INT) AS n_tok,
        |  CAST(score AS BIGINT) AS score, CAST(rank AS BIGINT) AS rank,
        |  rank <= n_raw // 5 AS selected
        |FROM rk, n ORDER BY doc_id""".stripMargin,
    // x83: row_number over the same (n_tokens, doc_id) total order + the
    // exact (rank−1)·1e6 div (n−1) ppm division.
    "x83_rank_ppm" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(row_number() OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS rank,
        |    count(*) OVER () AS n
        |  FROM tk
        |)
        |SELECT doc_id, n_tokens, rank,
        |  CAST((rank - 1) * 1000000 // greatest(n - 1, 1) AS BIGINT) AS rank_ppm
        |FROM r ORDER BY doc_id""".stripMargin,
    // x84: rebuild v2 with the same %13/%11/%17 rules and compare digests
    // through a full outer join — all four statuses live.
    "x84_corpus_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, md5(text) AS old_md5 FROM documents
        |), v2 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END) AS new_md5
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 30000, md5('new release doc ' || doc_id)
        |  FROM documents WHERE doc_id % 17 = 0
        |)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.doc_id IS NULL THEN 'added'
        |       WHEN v2.doc_id IS NULL THEN 'removed'
        |       WHEN old_md5 = new_md5 THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  old_md5, new_md5
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |ORDER BY doc_id""".stripMargin,
    // x75: brute-force FROZEN-INDEX ground truth — stop set from the
    // index's distinct-text df only (empty at gate corpus sizes since the
    // index has < maxDf distinct texts), kept sets = shingles minus stop
    // on BOTH sides (delivery-unseen shingles count in the set size,
    // never the intersection), 6-dp-rounded Jaccard (the operator's exact
    // comparison), exact > near precedence, min index id per class.
    "x75_indexed_ingest" ->
      """WITH idx AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 250
        |), newb AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 250
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20
        |), ex AS (
        |  SELECT n.doc_id, min(i.doc_id) AS m
        |  FROM newb n JOIN idx i ON md5(n.text) = md5(i.text) GROUP BY n.doc_id
        |), shi AS (
        |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                                for i in range(1, len(t) - 1)]) AS sh
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM idx)
        |  WHERE len(t) >= 3
        |), shn AS (
        |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                                for i in range(1, len(t) - 1)]) AS sh
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM newb)
        |  WHERE len(t) >= 3
        |), icls AS (
        |  SELECT min(doc_id) AS rep FROM idx GROUP BY md5(text)
        |), dfc AS (
        |  SELECT gram, count(*) AS df
        |  FROM (SELECT doc_id, unnest(sh) AS gram FROM shi)
        |  WHERE doc_id IN (SELECT rep FROM icls) GROUP BY gram
        |), stop AS (
        |  SELECT gram FROM dfc WHERE df > 1000
        |), ki AS (
        |  SELECT doc_id, gram FROM (SELECT doc_id, unnest(sh) AS gram FROM shi)
        |  WHERE gram NOT IN (SELECT gram FROM stop)
        |), kn AS (
        |  SELECT doc_id, gram FROM (SELECT doc_id, unnest(sh) AS gram FROM shn)
        |  WHERE gram NOT IN (SELECT gram FROM stop)
        |), szi AS (
        |  SELECT doc_id, count(*) AS sz FROM ki GROUP BY doc_id
        |), szn AS (
        |  SELECT doc_id, count(*) AS sz FROM kn GROUP BY doc_id
        |), cm AS (
        |  SELECT kn.doc_id AS nid, ki.doc_id AS iid, count(*) AS c
        |  FROM kn JOIN ki USING (gram) GROUP BY nid, iid
        |), nr AS (
        |  SELECT nid AS doc_id, min(iid) AS m
        |  FROM cm JOIN szn ON szn.doc_id = nid JOIN szi ON szi.doc_id = iid
        |  WHERE round(c * 1.0 / (szn.sz + szi.sz - c), 6) >= 0.5
        |  GROUP BY nid
        |)
        |SELECT n.doc_id,
        |  CASE WHEN ex.m IS NOT NULL THEN 'exact'
        |       WHEN nr.m IS NOT NULL THEN 'near'
        |       ELSE 'novel' END AS status,
        |  coalesce(ex.m, nr.m) AS match_id
        |FROM newb n LEFT JOIN ex ON n.doc_id = ex.doc_id
        |LEFT JOIN nr ON n.doc_id = nr.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    // x68: integer epoch-hour buckets (epoch_us // 3.6e9 — matches the
    // ev() ts_us contract), quantile_cont ×2 cast BIGINT is exact because
    // medians of integers are half-integers; same 4·dev2 > 7·mad4
    // cross-multiply as the Spark side.
    "x68_burst_screen" ->
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, CAST(2 * quantile_cont(n_events, 0.5) AS BIGINT) AS med2
        |  FROM b GROUP BY event_type
        |), d AS (
        |  SELECT b.event_type, b.bucket, b.n_events,
        |    abs(2 * b.n_events - m.med2) AS dev2
        |  FROM b JOIN m USING (event_type)
        |), md AS (
        |  SELECT event_type, CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
        |  FROM d GROUP BY event_type
        |)
        |SELECT d.event_type, CAST(d.bucket AS BIGINT) AS bucket, d.n_events,
        |  (4 * d.dev2 > 7 * md.mad4) AS is_burst
        |FROM d JOIN md USING (event_type)
        |ORDER BY d.event_type, d.bucket""".stripMargin,
    // x70: the oracle replays the bigram stupid-backoff LM naively —
    // reference unigram/bigram count tables, per-pair integer ppm with
    // the same div semantics, m-weighted integer mean per document. All
    // sums CAST to BIGINT (the HUGEINT rendering rule).
    "x70_lm_fluency" ->
      """WITH rtk AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE doc_id % 2 = 0
        |), uni AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt_w
        |  FROM (SELECT unnest(toks) AS w FROM rtk) GROUP BY w
        |), big AS (
        |  SELECT p['w1'] AS w1, p['w2'] AS w2, CAST(count(*) AS BIGINT) AS cnt_b
        |  FROM (
        |    SELECT unnest(CASE WHEN len(toks) >= 2
        |      THEN [{'w1': toks[i], 'w2': toks[i+1]} for i in range(1, len(toks))]
        |      ELSE [] END) AS p
        |    FROM rtk)
        |  GROUP BY 1, 2
        |), n AS (
        |  SELECT greatest(CAST(coalesce(sum(cnt_w), 0) AS BIGINT), 1) AS total FROM uni
        |), ttk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE doc_id % 2 = 1
        |), pd AS (
        |  SELECT doc_id, p['w1'] AS w1, p['w2'] AS w2, CAST(count(*) AS BIGINT) AS m
        |  FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |      THEN [{'w1': toks[i], 'w2': toks[i+1]} for i in range(1, len(toks))]
        |      ELSE [] END) AS p
        |    FROM ttk)
        |  GROUP BY 1, 2, 3
        |), sc AS (
        |  SELECT pd.doc_id, pd.m,
        |    CASE WHEN b.cnt_b IS NOT NULL THEN b.cnt_b * 1000000 // u1.cnt_w
        |         ELSE coalesce(u2.cnt_w, 0) * 400000 // n.total END AS p_ppm,
        |    (b.cnt_b IS NOT NULL) AS hit
        |  FROM pd
        |  LEFT JOIN big b ON pd.w1 = b.w1 AND pd.w2 = b.w2
        |  LEFT JOIN uni u1 ON pd.w1 = u1.w
        |  LEFT JOIN uni u2 ON pd.w2 = u2.w, n
        |), agg AS (
        |  SELECT doc_id,
        |    CAST(sum(m) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN hit THEN m ELSE 0 END) AS BIGINT) AS n_hit,
        |    CAST(sum(m * p_ppm) // sum(m) AS BIGINT) AS fluency_ppm
        |  FROM sc GROUP BY doc_id
        |)
        |SELECT ttk.doc_id,
        |  CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
        |  CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
        |  CAST(coalesce(fluency_ppm, -1) AS BIGINT) AS fluency_ppm
        |FROM ttk LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // x71: x14's recursive-closure components (component minimum as root;
    // docs in no pair root to themselves), then the hex-threshold split:
    // round(0.8·65536) = 0xcccd, round(0.9·65536) = 0xe666 — the same
    // constants Sampling.thresholdHex renders on the Spark side.
    "x71_leakage_split" ->
      s"""WITH RECURSIVE $invJaccardPairsSql, bidir AS (
        |  SELECT a_id AS src, b_id AS dst FROM pairs_j
        |  UNION SELECT b_id AS src, a_id AS dst FROM pairs_j
        |), reach AS (
        |  SELECT src, dst FROM bidir
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN bidir e ON r.dst = e.src
        |), comp AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS comp_id
        |  FROM reach GROUP BY src
        |), rooted AS (
        |  SELECT d.doc_id, CAST(coalesce(comp_id, d.doc_id) AS BIGINT) AS root_id
        |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.doc_id
        |)
        |SELECT doc_id, root_id,
        |  CASE WHEN substr(md5(CAST(root_id AS VARCHAR)), 1, 4) < 'cccd' THEN 'train'
        |       WHEN substr(md5(CAST(root_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM rooted ORDER BY doc_id""".stripMargin,
    // x73: replay the corrected integer sqrt (floor(sqrt(double)) seed,
    // ±1 correction so r² ≤ x < (r+1)² exactly) and every ppm division.
    "x73_temp_quotas" ->
      """WITH tk AS (
        |  SELECT source, len(string_split_regex(trim(text), '\s+')) AS nt FROM documents
        |), ps AS (
        |  SELECT source, CAST(sum(nt) AS BIGINT) AS n_tokens FROM tk GROUP BY source
        |), sq AS (
        |  SELECT source, n_tokens,
        |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS r0
        |  FROM ps
        |), w AS (
        |  SELECT source, n_tokens,
        |    CASE WHEN (r0+1)*(r0+1) <= n_tokens THEN r0+1
        |         WHEN r0*r0 > n_tokens THEN r0-1 ELSE r0 END AS weight
        |  FROM sq
        |), t AS (
        |  SELECT greatest(CAST(sum(n_tokens) AS BIGINT), 1) AS tt,
        |         greatest(CAST(sum(weight) AS BIGINT), 1) AS tw
        |  FROM w
        |)
        |SELECT source, n_tokens, CAST(weight AS BIGINT) AS weight,
        |  CAST(n_tokens * 1000000 // tt AS BIGINT) AS share_ppm,
        |  CAST(weight * 1000000 // tw AS BIGINT) AS quota_ppm,
        |  CAST(CASE WHEN n_tokens * 1000000 // tt > 0
        |       THEN least((weight * 1000000 // tw) * 1000000 // (n_tokens * 1000000 // tt), 1000000)
        |       ELSE 1000000 END AS BIGINT) AS keep_rate_ppm
        |FROM w, t ORDER BY source""".stripMargin,
    // x74: replay winnowing exactly — hash40 per 3-gram (the kmv hex→int
    // splice), the h·2²⁰ + (2²⁰−1−pos) rightmost-min encoding, a plain
    // min frame window of w=4, distinct selected pairs, then the per-doc
    // summary. Short docs (< w grams) select nothing.
    "x74_winnow_fps" ->
      s"""WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 3 THEN
        |      [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)]
        |    ELSE [] END AS grams
        |  FROM tk
        |), ge AS (
        |  SELECT doc_id,
        |    unnest([{'pos': i - 1, 'gram': grams[i]} for i in range(1, len(grams) + 1)]) AS pg
        |  FROM g
        |), hx AS (
        |  SELECT doc_id, pg['pos'] AS pos, substr(md5(pg['gram']), 1, 10) AS h FROM ge
        |), enc AS (
        |  SELECT doc_id, pos,
        |    CAST($kmvHexToIntSql AS BIGINT) * 1048576 + (1048575 - pos) AS e
        |  FROM hx
        |), win AS (
        |  SELECT doc_id, pos,
        |    min(e) OVER (PARTITION BY doc_id ORDER BY pos
        |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
        |    count(*) OVER (PARTITION BY doc_id) AS n_grams
        |  FROM enc
        |), fps AS (
        |  SELECT DISTINCT doc_id, sel // 1048576 AS fp_hash
        |    , 1048575 - (sel % 1048576) AS fp_pos
        |  FROM win WHERE pos <= n_grams - 4
        |), agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
        |    CAST(sum(fp_hash) AS BIGINT) AS fp_sum
        |  FROM fps GROUP BY doc_id
        |)
        |SELECT g.doc_id, CAST(len(grams) AS INTEGER) AS n_grams,
        |  CAST(coalesce(n_fps, 0) AS BIGINT) AS n_fps,
        |  CAST(coalesce(fp_sum, 0) AS BIGINT) AS fp_sum
        |FROM g LEFT JOIN agg ON g.doc_id = agg.doc_id ORDER BY g.doc_id""".stripMargin
  )
}
