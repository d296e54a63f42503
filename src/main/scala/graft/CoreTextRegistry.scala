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

/** Text-analysis, dedup, quality and robust-stats surfaces (x01-x48):
  * the first half of the LLM-data core.
  *
  * Part of the SparkEntry registry split — see [[SparkEntryBase]].
  */
private[graft] trait CoreTextRegistry extends OptionsRegistry {
  /** Exact dedup by text digest. */
  protected def x01(s: SparkSession, dir: String): DataFrame =
    Dedup
      .exact(t(s, dir, "documents"))
      .orderBy(col("text_md5"))

  /** Normalized-text fingerprint per document. */
  protected def x02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** Per-document text statistics. */
  protected def x03(s: SparkSession, dir: String): DataFrame =
    TextAnalysis
      .withTextStats(dts(s, dir))
      .select(
        col("doc_id"),
        col("n_chars_c"),
        col("n_tokens"),
        col("n_distinct_tokens"),
        col("avg_token_len"),
        col("type_token_ratio")
      )
      .orderBy(col("doc_id"))

  /** Token counting: whitespace words + BPE-ish regex tokens. */
  protected def x04(s: SparkSession, dir: String): DataFrame =
    dts(s, dir)
      .select(
        col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("ws_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpeish_tokens")
      )
      .orderBy(col("doc_id"))

  /** Language-ID heuristic (marker stopword argmax). */
  protected def x05(s: SparkSession, dir: String): DataFrame =
    dts(s, dir)
      .select(col("doc_id"), TextAnalysis.langId(TextAnalysis.tokens(col("text"))).as("lang_pred"))
      .orderBy(col("doc_id"))

  /** Exact 3-gram Jaccard near-dup pairs (inverted-index formulation). */
  protected def x06(s: SparkSession, dir: String): DataFrame =
    Dedup
      .ngramJaccardPairs(t(s, dir, "documents"), n = 3, threshold = 0.5)
      .msorted(col("a_id"), col("b_id"))

  /** MinHash-LSH near-dup pairs, verified with exact Jaccard — must agree
    * with x06 given the (bands=32, r=4) S-curve at this threshold.
    */
  protected def x07(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Dedup
      .minhashLshPairs(
        t(s, dir, "documents"),
        n = 3,
        threshold = 0.5,
        bands = 32,
        rowsPerBand = 4
      )
      .orderBy(col("a_id"), col("b_id"))
  }

  /** SimHash signatures per document, in the MD5-derived form whose every
    * bit is reproducible in DuckDB (`md5()` + nibble bit-extraction) — so
    * the signature itself is driver-oracled, closing round 2's `no_oracle`
    * row. Emitted as the four 16-bit bands the Hamming blocking uses. The
    * xxhash64 production signature keeps its spec golden (DedupSpec).
    *
    * The pivot shape (posexplode → groupBy) evaluates the signature
    * expression ONCE per document; four element_at projections would let
    * CollapseProject inline — and recompute — it per band (the MinHashBands
    * lesson).
    */
  protected def x08(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        posexplode(GraftFunctions.simhashMd5Bands(TextAnalysis.tokens(col("text"))))
          .as(Seq("j", "v"))
      )
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("j") === 0, col("v"))).as("band0"),
        max(when(col("j") === 1, col("v"))).as("band1"),
        max(when(col("j") === 2, col("v"))).as("band2"),
        max(when(col("j") === 3, col("v"))).as("band3")
      )
      .orderBy(col("doc_id"))
  }

  /** Embedding-cosine near-dup pairs at 0.45 (max pair sim in this corpus
    * is ~0.51, so the threshold yields a non-trivial, stable pair set).
    * Uses the auto-switching operator: exact all-pairs below 10⁵ docs (this
    * corpus), RP-LSH table blocking above — both branches are code, and
    * DedupSpec pins LSH ≡ exact on the real corpus.
    */
  protected def x11(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Dedup
      .embeddingNearDupPairs(t(s, dir, "embeddings"), threshold = 0.45)
      .msorted(col("a_id"), col("b_id"))
  }

  /** Composite document quality score (length saturation, alpha ratio,
    * stopword presence, type-token ratio — TextAnalysis.qualityScore).
    */
  protected def x12(s: SparkSession, dir: String): DataFrame =
    dts(s, dir)
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** Near-dup clustering: connected components (Pregel-style min-label
    * propagation, see [[graft.operators.Cluster]]) over the x06 pair set —
    * the pairs→clusters→canonical step of corpus dedup. Oracled against a
    * DuckDB recursive-CTE transitive closure of the same edges.
    */
  protected def x14(s: SparkSession, dir: String): DataFrame =
    Cluster
      .connectedComponents(Dedup.ngramJaccardPairs(t(s, dir, "documents"), n = 3, threshold = 0.5))
      .select(col("id").as("doc_id"), col("comp").as("comp_id"))
      .orderBy(col("doc_id"))

  /** Deterministic stratified sampling: language-rebalance the corpus with
    * content-hash (md5-bucket) keep decisions — reproducible across runs,
    * clusters, and retries (no rand()).
    */
  protected def x15(s: SparkSession, dir: String): DataFrame =
    Sampling
      .stratifiedSample(
        t(s, dir, "documents"),
        key = col("text"),
        strata = col("lang"),
        rates = Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.25, "fr" -> 0.25)
      )
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Train/eval decontamination: every 50th doc plays the eval set; corpus
    * docs sharing ≥1 distinct 3-gram with it are flagged with their overlap
    * ratio (broadcast eval grams, one corpus pass).
    */
  protected def x16(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Decontaminate
      .overlap(
        corpus = docs.where(col("doc_id") % 50 =!= 0),
        evalSet = docs.where(col("doc_id") % 50 === 0),
        n = 3
      )
      .orderBy(col("doc_id"))
  }

  /** The bloom-prefiltered decontamination scale path (filter bits
    * broadcast instead of the gram set, exact verification after): MUST
    * hash-match x16's oracle exactly — bloom has no false negatives and
    * the verify join removes its false positives.
    */
  protected def x21(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val docs = t(s, dir, "documents")
    Decontaminate
      .overlapBloom(
        corpus = docs.where(col("doc_id") % 50 =!= 0),
        evalSet = docs.where(col("doc_id") % 50 === 0),
        n = 3,
        expectedGrams = 10000L
      )
      .orderBy(col("doc_id"))
  }

  /** Gap-based sessionization of the event stream (6 h gap): one shuffle,
    * two stacked windows + rollup on the same partitioning. The value sum
    * is emitted as exact integer cents ([[Sessionize.sessionsCents]]) so
    * the output contract is all-integer — round 3's only red driver row
    * was this query failing `hash_match` while exact value equality
    * passed, i.e. a double-RENDERING divergence in the gate's hash, not a
    * numeric one; an integer contract removes that class entirely.
    */
  protected def x17(s: SparkSession, dir: String): DataFrame =
    Sessionize
      .sessionsCents(
        ev(s, dir),
        key = col("user_id"),
        ts = col("ts_us"),
        maxGap = 21600000000L,
        tieBreak = col("event_id"),
        valueCol = col("value")
      )
      .orderBy(col("key"), col("session_idx"))

  /** Within-doc repetition signals (Gopher-style quality pre-filter).
    * Spark side is map-only (sorted-array fold for top-token count); the
    * oracle uses the explode/group formulation — agreeing results pin both.
    */
  protected def x18(s: SparkSession, dir: String): DataFrame =
    TextAnalysis
      .withRepetitionStats(dts(s, dir))
      .select(col("doc_id"), col("top_token_frac"), col("dup_2gram_frac"), col("dup_3gram_frac"))
      .orderBy(col("doc_id"))

  /** Corpus TF-IDF: top-3 terms per document (smoothed idf, rounded-score
    * ranking — see [[TextAnalysis.tfIdfTopTerms]] for the 4-stage
    * distributed shape and why the per-doc window cannot skew).
    */
  protected def x22(s: SparkSession, dir: String): DataFrame =
    TextAnalysis
      .tfIdfTopTerms(dts(s, dir), k = 3)
      .orderBy(col("doc_id"), col("rank"))

  /** Unicode NFC normalization ([[graft.functions.NfcNormalize]], codegen'd
    * custom expression — Spark has no built-in normalizer) over documents
    * with a decomposed-form suffix appended (combining acute/diaeresis),
    * since the corpus itself is pure ASCII — same injection pattern as q12's
    * NaN and x19's PII. n_before > n_after proves composition happened;
    * md5 pins the exact normalized bytes against DuckDB's nfc_normalize.
    */
  protected def x23(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val raw = concat(
      col("text"),
      lit(" cafe\u0301 u\u0308ber no\u0308e\u0301l") // decomposed: U+0301 acute, U+0308 diaeresis — matches oracle chr(769)/chr(776)
    )
    dts(s, dir)
      .select(
        col("doc_id"),
        length(raw).as("n_before"),
        length(GraftFunctions.nfcNormalize(raw)).as("n_after"),
        md5(GraftFunctions.nfcNormalize(raw)).as("norm_md5")
      )
      .orderBy(col("doc_id"))
  }

  /** Sequence packing ([[Pack.nextFit]]): whitespace-token counts into
    * 256-token bins, 32 packing groups keyed doc_id%32 (the oracle can't
    * reproduce xxhash64, so the test pins the group rule explicitly; the
    * default hash grouping is spec-covered in PackSpec). Oracled against a
    * DuckDB recursive-CTE walk of the same next-fit rule — recursion depth
    * = docs per group, which is exactly the bounded-group-size property
    * the distributed design relies on.
    */
  protected def x24(s: SparkSession, dir: String): DataFrame = {
    val docs = dts(s, dir)
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
    Pack
      .nextFit(
        docs,
        idCol = "doc_id",
        tokensCol = "n_tokens",
        capacity = 256,
        numGroups = 32,
        groupExpr = Some(pmod(col("doc_id"), lit(32)))
      )
      .select(col("grp"), col("bin"), col("doc"), col("toks"), col("bin_fill"), col("oversize"))
      .orderBy(col("doc"))
  }

  /** Character-entropy quality signal ([[TextAnalysis.charEntropy]] — the
    * map-only sorted-run fold; the oracle is the explode/groupBy
    * formulation, so agreement pins both algorithms).
    */
  protected def x25(s: SparkSession, dir: String): DataFrame =
    dts(s, dir)
      .select(col("doc_id"), TextAnalysis.charEntropy(col("text")).as("char_entropy"))
      .orderBy(col("doc_id"))

  /** PII scrub over documents with deterministic synthetic PII appended
    * (the corpus itself is PII-free, like q12 injects NaN): per-class hit
    * counts + md5 of the redacted text.
    */
  protected def x19(s: SparkSession, dir: String): DataFrame =
    Scrub
      .withPiiRedaction(
        dts(s, dir).select(
          col("doc_id"),
          concat(
            col("text"),
            lit(" contact user"), col("doc_id"),
            lit("@example.com or http://example"), col("doc_id"),
            lit(".org call +1 555 000"), col("doc_id")
          ).as("text")
        )
      )
      .select(
        col("doc_id"),
        col("n_emails"),
        col("n_urls"),
        col("n_phones"),
        md5(col("text_redacted")).as("red_md5")
      )
      .orderBy(col("doc_id"))

  /** MD5-simhash near-dup pairs (Hamming ≤ 3) via 4-band blocking. The
    * banding is provably lossless at this radius (pigeonhole: ≤3 differing
    * bits cannot touch all 4 bands), so the banded plan must equal the
    * all-pairs SQL formulation exactly — a fully oracled near-dup surface
    * for the simhash family to complement x07's MinHash-LSH one.
    */
  protected def x28(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Dedup
      .simhashMd5Pairs(t(s, dir, "documents"), maxHamming = 3)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Token-budget corpus mixing (x36): the data-mixing verb of training-set
    * assembly — each language keeps a deterministic hash-ordered prefix of
    * its documents whose inclusive token sum stays within that language's
    * budget ([[graft.operators.Mix.tokenBudgetFill]]). Spark computes the
    * running sum with the TWO-PHASE distributed shape (range partition →
    * per-slice sums → broadcast offsets → partition-local ROWS window — the
    * [[graft.operators.GlobalRank]] pattern generalized from row_number to
    * weighted sums; no single-partition window, the q27 lesson); the oracle
    * uses DuckDB's plain global window — two algorithms, one answer. Token
    * counts and hash order are the x04/x15 contracts (whitespace split,
    * md5), so every column is an integer or a verbatim string.
    */
  protected def x36(s: SparkSession, dir: String): DataFrame = {
    val docs = dts(s, dir).select(
      col("doc_id"),
      col("lang"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"),
      md5(col("text")).as("h")
    )
    Mix
      .tokenBudgetFill(
        docs,
        source = col("lang"),
        sort = Seq(col("h"), col("doc_id")),
        weight = col("n_tok"),
        budgets = Map("en" -> 20000L),
        defaultBudget = 8000L
      )
      .select(col("doc_id"), col("lang"), col("n_tok"), col("cum_tok"))
      .orderBy(col("doc_id"))
  }

  /** Token-window chunking (x37): window 48, stride 32, so ~60-token docs
    * exercise both the short-doc single-chunk branch and the multi-chunk
    * overlap path. Map-only — see [[Chunk.tokenWindows]]. The chunk text
    * itself is in the hash-compared contract, so slicing/joining must
    * agree byte-for-byte with the oracle's list_slice.
    */
  protected def x37(s: SparkSession, dir: String): DataFrame =
    Chunk
      .tokenWindows(dts(s, dir), window = 48, stride = 32)
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Corpus bigram vocabulary (x38): global top-50 by total occurrence,
    * gram-ascending tie-break. Spark plans the top-k as
    * TakeOrderedAndProject (per-partition heaps, no global sort) — the
    * vocab-building shape that survives a 100 TB corpus; the oracle is a
    * plain ORDER BY ... LIMIT.
    */
  protected def x38(s: SparkSession, dir: String): DataFrame =
    TextAnalysis
      .topNgramVocab(dts(s, dir), n = 2, k = 50)

  /** N-gram novelty in doc-id order (x39): first-occurrence counting via
    * min-doc-id per shingle — see [[TextAnalysis.ngramNovelty]] for why
    * novel counts collapse to one row per doc BEFORE any join. Integer
    * ppm contract (the x17 lesson).
    */
  protected def x39(s: SparkSession, dir: String): DataFrame =
    TextAnalysis
      .ngramNovelty(dts(s, dir), n = 3)
      .orderBy(col("doc_id"))

  /** Token-balanced contiguous sharding (x42): cut the md5-ordered corpus
    * into 8 shards of near-equal TOKEN mass — see [[Mix.tokenShards]] for
    * why token (not document-count) balance is the verb training shards
    * need. Spark computes the running sum two-phase (no single-partition
    * window); the oracle uses the plain global window plus the same
    * `offset·S div total` closed form — two algorithms, one answer, all
    * integers.
    */
  protected def x42(s: SparkSession, dir: String): DataFrame = {
    val docs = dts(s, dir).select(
      col("doc_id"),
      md5(col("text")).as("h"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok")
    )
    Mix
      .tokenShards(docs, sort = Seq(col("h"), col("doc_id")), weight = col("n_tok"), numShards = 8)
      .select(col("doc_id"), col("n_tok"), col("cum_tok"), col("shard"))
      .orderBy(col("doc_id"))
  }

  /** Exact heavy hitters (every token at >= 2% corpus frequency) via the
    * Misra-Gries sketch + exact-recount two-phase shape — see
    * [[TextAnalysis.heavyTokens]] for the candidate-completeness bound and
    * why the one-phase groupBy-everything twin (the DuckDB oracle) is the
    * 100 TB anti-pattern this replaces. phi = 1/50, k = 100 = 2·denom/num.
    */
  protected def x43(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.heavyTokens(dts(s, dir), phiNum = 1L, phiDenom = 50L, k = 100)

  /** Canonical-doc selection per near-dup cluster — the curation step after
    * x14's connected components: keep the highest-quality member (x12's
    * score; ties → lowest doc id), singletons as their own cluster. Argmax
    * via `max(struct(score, -id))` — no per-cluster window/sort; see
    * [[Cluster.canonical]].
    */
  protected def x44(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scored = docs.select(
      col("doc_id").as("id"),
      TextAnalysis.qualityScore(col("text")).as("score"))
    val comps = Cluster.connectedComponents(
      Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5))
    Cluster
      .canonical(scored, comps)
      .select(col("comp_id"), col("keep_id"), col("score").as("quality"), col("n_members"))
      .orderBy(col("comp_id"))
  }

  /** Fuzzy-matching surface: every unordered pair of distinct p_brand
    * values at edit distance ≤ 1, found via symmetric-deletion blocking
    * (SymSpell) — NOT an all-pairs levenshtein. The deletion-variant
    * equi-join is provably complete for distance ≤ 1; the exact
    * levenshtein verify runs on candidates only. The brand domain is
    * small, but the operator is the corpus-scale shape (variant
    * explosion is map-side and length-bounded; one shuffle on the
    * variant key) — FuzzySpec pins blocking ≡ brute force on an open
    * vocabulary.
    */
  protected def x45(s: SparkSession, dir: String): DataFrame =
    Fuzzy
      .editDistance1Pairs(t(s, dir, "part"), "p_brand")
      .orderBy(col("a_val"), col("b_val"))

  /** Data-layout surface: Z-order (Morton) zone maps over lineitem's
    * (partkey, suppkey) — 16 equal-width zones of the 20-bit interleaved
    * code, each reporting its min/max span in BOTH dimensions. The
    * pruning claim is in the numbers: every zone spans ≤ 1/4 of each
    * 10-bit dimension (top 2 bits of each dim are fixed per zone), which
    * a single-column sort cannot give for the second column. All-integer
    * bit arithmetic — the DuckDB oracle interleaves the same bits from a
    * programmatically shared bit-term list (the two sides cannot drift).
    */
  protected def x47(s: SparkSession, dir: String): DataFrame =
    ZOrder
      .zoneSpans(
        t(s, dir, "lineitem"),
        a = col("l_partkey") % 1024,
        b = col("l_suppkey") % 1024,
        bits = zorderBits,
        buckets = 16
      )
      .orderBy(col("zone"))

  /** Robust-stats surface: per-event-type median/MAD outlier screen over
    * the value stream (|dev|·10 > MAD·35, the conventional k=3.5 rule in
    * integer-scaled form — pure IEEE multiplies, both engines flag the
    * identical rows). Exact type-7 percentiles, parity pinned by q15.
    */
  protected def x48(s: SparkSession, dir: String): DataFrame =
    Robust
      .madOutliers(ev(s, dir), col("event_type"), col("value"))
      .select(
        col("graft_key").as("event_type"),
        col("med"),
        col("mad"),
        col("n_total"),
        col("n_outliers")
      )
      .orderBy(col("event_type"))

  /** DuckDB-side 4-hex-digit prefix → integer for x100's feature buckets,
    * generated from the SAME positional loop shape as [[kmvHexToIntSql]]
    * (most-significant digit first) so the decode cannot drift from
    * [[graft.operators.ImportanceResampling.bucket]]'s `conv(substr(md5,
    * 1, 4), 16, 10)`. `h` is the 32-char lowercase md5 hex string in
    * scope at the splice point.
    */
  protected val hex4ToIntSql: String =
    (1 to 4)
      .map(i =>
        s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * " +
          s"${1L << (4 * (4 - i))}")
      .mkString(" + ")

  /** Shared Z-order geometry for x47: bit width and the DuckDB-side
    * interleave expression generated from the SAME loop shape as
    * [[graft.operators.ZOrder.zValue]] (a on even bits, b on odd).
    */
  protected val zorderBits = 10
  protected val zorderInterleaveSql: String =
    (0 until zorderBits)
      .flatMap(i =>
        Seq(
          s"((((za >> $i) & 1)::BIGINT) << ${2 * i})",
          s"((((zb >> $i) & 1)::BIGINT) << ${2 * i + 1})"
        )
      )
      .mkString(" | ")

  /** The two boilerplate spans x31 plants (single Scala vals interpolated
    * into BOTH the Spark injection and the DuckDB oracle, so the two sides
    * cannot drift): distinctive uppercase/punctuation content that the
    * lowercase synthetic corpus can never accidentally extend.
    */
  protected val substrInjA =
    " ### COMMON LICENSE HEADER v2.1: Redistribution and use in source and binary forms, with or without modification, are permitted. ###"
  protected val substrInjB =
    " >>> SHARED FOOTER: Generated by a synthetic corpus tool; do not edit below this line. <<<"

  /** Exact-substring dedup (x31): documents sharing a long VERBATIM span.
    * Docs ≡0 (mod 37) get boilerplate A appended, ≡0 (mod 41) boilerplate
    * B (doc 0 hits both predicates; CASE order picks A identically on both
    * engines) — the planted substring-duplicate classes; the corpus's own
    * 24-char gram collisions (tiny vocabulary) ride along and must match
    * too. See [[SubstringDedup.anchorPairs]] for the anchor + extend
    * design and its scale posture. maxDf=200 keeps the planted classes
    * (≤136 docs at sf0.1) below the boilerplate-prune threshold at every
    * SF.
    */
  protected def x31(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 37 === 0, concat(col("text"), lit(substrInjA)))
          .when(col("doc_id") % 41 === 0, concat(col("text"), lit(substrInjB)))
          .otherwise(col("text"))
          .as("text")
      )
    SubstringDedup
      .anchorPairs(docs, k = 24, maxDf = 200)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Shared by x16 (broadcast path) and x21 (bloom path) — one ground
    * truth, two distributed strategies.
    */
  protected val decontaminateOracle: String =
    """WITH tk AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 3 THEN
      |      list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)])
      |    ELSE [] END AS s
      |  FROM tk
      |), ev AS (
      |  SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 50 = 0
      |), cg AS (
      |  SELECT doc_id, len(s) AS n_grams, unnest(s) AS gram FROM sh WHERE doc_id % 50 <> 0
      |)
      |SELECT cg.doc_id, count(*) AS n_hit_grams, n_grams,
      |  round(CAST(count(*) AS DOUBLE) / n_grams, 4) AS contamination
      |FROM cg JOIN ev USING (gram)
      |GROUP BY cg.doc_id, n_grams ORDER BY cg.doc_id""".stripMargin

  /** Shared DuckDB derivation of the MD5-simhash bands — the SQL mirror of
    * [[graft.functions.SimHashMd5Bands]]'s bit convention: every token
    * occurrence votes ±1 per bit, bit b of the hash is
    * `(nibble(hexchar[b/4]) >> (3 - b%4)) & 1` over md5's hex rendering,
    * sign>0 → 1, and band j packs bits 16j..16j+15 MSB-first.
    */
  protected def simhashMd5BandsPfxSql(pfx: String): String =
    s"""${pfx}tk AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
      |), ${pfx}bits AS (
      |  SELECT doc_id, g.b,
      |    CASE WHEN ((strpos('0123456789abcdef', substr(md5(tok), (g.b // 4) + 1, 1)) - 1)
      |               >> (3 - (g.b % 4))) & 1 = 1 THEN 1 ELSE -1 END AS vote
      |  FROM ${pfx}tk CROSS JOIN (SELECT unnest(range(64)) AS b) g
      |), ${pfx}sbit AS (
      |  SELECT doc_id, b, CASE WHEN sum(vote) > 0 THEN 1 ELSE 0 END AS bit
      |  FROM ${pfx}bits GROUP BY doc_id, b
      |), ${pfx}bnd AS (
      |  SELECT doc_id, b // 16 AS j, CAST(sum(bit * (1 << (15 - (b % 16)))) AS INT) AS v
      |  FROM ${pfx}sbit GROUP BY doc_id, b // 16
      |), ${pfx}piv AS (
      |  SELECT doc_id,
      |    max(CASE WHEN j = 0 THEN v END) AS band0,
      |    max(CASE WHEN j = 1 THEN v END) AS band1,
      |    max(CASE WHEN j = 2 THEN v END) AS band2,
      |    max(CASE WHEN j = 3 THEN v END) AS band3
      |  FROM ${pfx}bnd GROUP BY doc_id
      |)""".stripMargin

  protected val simhashMd5BandsSql: String = simhashMd5BandsPfxSql("")

  /** Shared DuckDB miner for the exact 3-gram-Jaccard pair set at
    * threshold 0.5 — the INVERTED-INDEX replay that retired the
    * quadratic-oracle exemption for x06/x07/x14/x44/x71 at bench scale
    * (the r10 verdict's top item, the x111–x113 posture applied to the
    * exact-Jaccard family). LOSSLESS by construction, not probabilistic:
    * jaccard(A,B) ≥ 0.5 > 0 requires at least one shared shingle, so
    * equi-joining the per-doc DISTINCT-shingle index drops no qualifying
    * pair, and the per-pair match count IS |A ∩ B| — no list_intersect,
    * no n²/2 pair loop. Oracle work is Σ_g m_g(m_g−1)/2 over posting
    * lists (measured ~1.3M candidate rows / ~1.5 s at sf0.1, vs the old
    * closure's 12.5M list-intersections that blew any budget), the same
    * candidate-bound law the engine side (Dedup.ngramJaccardPairs) runs.
    * `tk` deliberately carries `text` — x44's quality stage reuses it.
    * Exposes `pairs_j(a_id, b_id, jac)` with the threshold applied on the
    * UNROUNDED ratio, exactly like the engine.
    */
  protected val invJaccardPairsSql: String =
    """tk AS (
      |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 3 THEN
      |      list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)])
      |    ELSE [] END AS s
      |  FROM tk
      |), jsz AS (
      |  SELECT doc_id, len(s) AS sz FROM sh
      |), jinv AS (
      |  SELECT doc_id, unnest(s) AS g FROM sh
      |), jcand AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
      |  FROM jinv a JOIN jinv b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs_j AS (
      |  SELECT a_id, b_id,
      |    CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jac
      |  FROM jcand
      |  JOIN jsz sa ON sa.doc_id = a_id
      |  JOIN jsz sb ON sb.doc_id = b_id
      |  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
      |)""".stripMargin

  /** Dedup-quality eval (x160): the x135 "measure, don't guess" idiom
    * applied to the near-dup family — score the SimHash Hamming≤3 pair
    * miner (x28's surface) against the exact 3-gram-Jaccard≥0.5 ground
    * truth (x06's surface) as a confusion row: n_true / n_pred / n_hit
    * plus integer-ppm precision, recall, and F1. The two pair sets
    * genuinely differ (a 64-bit token-level sketch vs exact shingle
    * overlap), so the surface reports a real operating point — the
    * number a curation team reads before trusting a cheap sketch at
    * 100 TB where the exact miner is unaffordable. Both sides reuse the
    * registered operators verbatim; the oracle combines their two
    * existing CTE chains (the simhash chain prefixed to avoid the
    * shared `tk` name) and replays the same full-outer-join confusion.
    */
  protected def x160(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val docs = t(s, dir, "documents")
    val truth = Dedup
      .ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .select(col("a_id"), col("b_id"), lit(1L).as("is_t"))
    val pred = Dedup
      .simhashMd5Pairs(docs, maxHamming = 3)
      .select(col("a_id"), col("b_id"), lit(1L).as("is_p"))
    truth
      .join(pred, Seq("a_id", "b_id"), "full_outer")
      .agg(
        coalesce(sum(col("is_t")), lit(0L)).as("n_true"),
        coalesce(sum(col("is_p")), lit(0L)).as("n_pred"),
        coalesce(sum(col("is_t") * col("is_p")), lit(0L)).as("n_hit"))
      .select(
        col("n_true"), col("n_pred"), col("n_hit"),
        expr("CAST(n_hit * 1000000 div greatest(n_pred, 1) AS BIGINT)")
          .as("precision_ppm"),
        expr("CAST(n_hit * 1000000 div greatest(n_true, 1) AS BIGINT)")
          .as("recall_ppm"),
        expr("CAST(n_hit * 2000000 div greatest(n_true + n_pred, 1) AS BIGINT)")
          .as("f1_ppm"))
  }

  protected lazy val coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x01_dedup_exact" -> (x01 _),
    "x02_fingerprint" -> (x02 _),
    "x03_text_stats" -> (x03 _),
    "x04_token_counts" -> (x04 _),
    "x05_lang_id" -> (x05 _),
    "x06_ngram_jaccard" -> (x06 _),
    "x07_minhash_lsh" -> (x07 _),
    "x08_simhash" -> (x08 _),
    "x11_embed_neardup" -> (x11 _),
    "x12_quality_score" -> (x12 _),
    "x14_neardup_clusters" -> (x14 _),
    "x15_hash_sample" -> (x15 _),
    "x16_decontaminate" -> (x16 _),
    "x17_sessionize" -> (x17 _),
    "x18_repetition" -> (x18 _),
    "x19_pii_scrub" -> (x19 _),
    "x21_decontaminate_bloom" -> (x21 _),
    "x22_tfidf" -> (x22 _),
    "x23_unicode_norm" -> (x23 _),
    "x24_pack" -> (x24 _),
    "x25_char_entropy" -> (x25 _),
    "x28_simhash_neardup" -> (x28 _),
    "x31_substring_dedup" -> (x31 _),
    "x36_token_budget_mix" -> (x36 _),
    "x37_token_chunks" -> (x37 _),
    "x38_vocab_topk" -> (x38 _),
    "x39_ngram_novelty" -> (x39 _),
    "x42_token_shards" -> (x42 _),
    "x43_heavy_tokens" -> (x43 _),
    "x44_cluster_canonical" -> (x44 _),
    "x45_fuzzy_editdist" -> (x45 _),
    "x47_zorder_zones" -> (x47 _),
    "x48_mad_outliers" -> (x48 _),
    "x160_dedup_eval" -> (x160 _)
  )

  protected lazy val coreOracles: Map[String, String] = Map(
    "x22_tfidf" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term
        |), dfc AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
        |    round(tf.tf * (ln((n.n_docs + 1.0) / (dfc.df + 1.0)) + 1.0), 6) AS tfidf
        |  FROM tf JOIN dfc USING (term) CROSS JOIN n
        |), ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        |  FROM scored
        |)
        |SELECT doc_id, rank, term, tf, df, tfidf FROM ranked
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "x24_pack" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, doc_id % 32 AS grp,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks
        |  FROM documents
        |), ranked AS (
        |  SELECT doc_id, grp, toks,
        |    row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
        |  FROM tok
        |), walk AS (
        |  SELECT doc_id, grp, toks, rn, CAST(0 AS BIGINT) AS bin, toks AS fill
        |  FROM ranked WHERE rn = 1
        |  UNION ALL
        |  SELECT r.doc_id, r.grp, r.toks, r.rn,
        |    CASE WHEN w.fill + r.toks > 256 AND w.fill > 0 THEN w.bin + 1 ELSE w.bin END,
        |    CASE WHEN w.fill + r.toks > 256 AND w.fill > 0 THEN r.toks ELSE w.fill + r.toks END
        |  FROM ranked r JOIN walk w ON r.grp = w.grp AND r.rn = w.rn + 1
        |)
        |SELECT grp, bin, doc_id AS doc, toks,
        |  CAST(sum(toks) OVER (PARTITION BY grp, bin) AS BIGINT) AS bin_fill,
        |  toks > 256 AS oversize
        |FROM walk ORDER BY doc""".stripMargin,
    "x25_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
        |), rc AS (
        |  SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS n FROM ch GROUP BY doc_id, c
        |), tot AS (
        |  SELECT doc_id, sum(n) AS total, sum(n * ln(n)) AS s FROM rc GROUP BY doc_id
        |)
        |SELECT doc_id,
        |  floor((ln(total) - s / total) * 10000 + 0.5) / 10000 AS char_entropy
        |FROM tot ORDER BY doc_id""".stripMargin,
    "x23_unicode_norm" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    text || ' cafe' || chr(769) || ' u' || chr(776) || 'ber no'
        |         || chr(776) || 'e' || chr(769) || 'l' AS raw
        |  FROM documents
        |)
        |SELECT doc_id, length(raw) AS n_before,
        |  length(nfc_normalize(raw)) AS n_after,
        |  md5(nfc_normalize(raw)) AS norm_md5
        |FROM r ORDER BY doc_id""".stripMargin,
    "x12_quality_score" ->
      """WITH tk AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), sc AS (
        |  SELECT doc_id,
        |    least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS len_score,
        |    (CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE) + 1.0)
        |      / (CAST(length(text) AS DOUBLE) + 1.0) AS alpha_ratio,
        |    least(CAST(len(list_filter(toks,
        |        t -> list_contains(['the','and','of','to','in','is','a'], t))) AS DOUBLE)
        |      / len(toks) * 10.0, 1.0) AS stop_score,
        |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM tk
        |)
        |SELECT doc_id,
        |  floor((0.3 * len_score + 0.3 * alpha_ratio + 0.2 * stop_score + 0.2 * ttr)
        |        * 10000 + 0.5) / 10000 AS quality
        |FROM sc ORDER BY doc_id""".stripMargin,
    "x01_dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY text_md5""".stripMargin,
    "x02_fingerprint" ->
      """SELECT doc_id,
        | md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x03_text_stats" ->
      """WITH tk AS (
        |  SELECT doc_id, length(text) AS n_chars_c,
        |    string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |)
        |SELECT doc_id, n_chars_c,
        |  len(toks) AS n_tokens,
        |  len(list_distinct(toks)) AS n_distinct_tokens,
        |  round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks), 4) AS avg_token_len,
        |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS type_token_ratio
        |FROM tk ORDER BY doc_id""".stripMargin,
    "x04_token_counts" ->
      """SELECT doc_id,
        | len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x05_lang_id" ->
      """WITH sc AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        t -> list_contains(['the','and','of','to','in','is','a'], t))) AS s_en,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        t -> list_contains(['el','los','de','y','que','en','una'], t))) AS s_es,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS s_de,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        t -> list_contains(['le','les','des','et','est','une','dans'], t))) AS s_fr
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE
        |    WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        |    WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
        |    WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
        |    WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
        |    ELSE 'fr'
        |  END AS lang_pred
        |FROM sc ORDER BY doc_id""".stripMargin,
    "x06_ngram_jaccard" ->
      s"""WITH $invJaccardPairsSql
        |SELECT a_id, b_id, round(jac, 6) AS jac
        |FROM pairs_j
        |ORDER BY a_id, b_id""".stripMargin,
    // x07 shares x06's exact oracle: the (bands=32, r=4) S-curve at this
    // threshold makes the banded result EQUAL the exact pair set on this
    // corpus — verified by hash at every tested SF now that the oracle is
    // candidate-bound rather than quadratic.
    "x07_minhash_lsh" ->
      s"""WITH $invJaccardPairsSql
        |SELECT a_id, b_id, round(jac, 6) AS jac
        |FROM pairs_j
        |ORDER BY a_id, b_id""".stripMargin,
    "x08_simhash" ->
      s"""WITH $simhashMd5BandsSql
        |SELECT doc_id, band0, band1, band2, band3 FROM piv ORDER BY doc_id""".stripMargin,
    "x28_simhash_neardup" ->
      s"""WITH $simhashMd5BandsSql
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))
        |     + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3)) AS INT) AS hamming
        |FROM piv a JOIN piv b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))
        |    + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    // x160: the two existing chains (simhash prefixed sx_ — both define a
    // `tk`) full-outer-joined into one confusion row, all-integer ppm.
    "x160_dedup_eval" ->
      (s"WITH $invJaccardPairsSql, ${simhashMd5BandsPfxSql("sx_")}, " +
        """spr AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sx_piv a JOIN sx_piv b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))
        |      + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3)) <= 3
        |), tr AS (
        |  SELECT a_id, b_id FROM pairs_j
        |), conf AS (
        |  SELECT
        |    CAST(sum(CASE WHEN t.a_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        |    CAST(sum(CASE WHEN p.a_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
        |    CAST(sum(CASE WHEN t.a_id IS NOT NULL AND p.a_id IS NOT NULL
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
        |  FROM tr t FULL OUTER JOIN spr p
        |    ON t.a_id = p.a_id AND t.b_id = p.b_id
        |)
        |SELECT n_true, n_pred, n_hit,
        |  CAST(n_hit * 1000000 // greatest(n_pred, 1) AS BIGINT) AS precision_ppm,
        |  CAST(n_hit * 1000000 // greatest(n_true, 1) AS BIGINT) AS recall_ppm,
        |  CAST(n_hit * 2000000 // greatest(n_true + n_pred, 1) AS BIGINT) AS f1_ppm
        |FROM conf""".stripMargin),
    // x36: the oracle computes the per-language running token sum with the
    // plain global window Spark deliberately avoids (two-phase range
    // partition + broadcast offsets on the engine side) — two algorithms,
    // one answer; integer-and-string-only contract.
    "x36_token_budget_mix" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
        |         md5(text) AS h
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tok,
        |         sum(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
        |  FROM d
        |)
        |SELECT doc_id, lang, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
        |FROM c
        |WHERE cum_tok <= CASE lang WHEN 'en' THEN 20000 ELSE 8000 END
        |ORDER BY doc_id""".stripMargin,
    "x31_substring_dedup" ->
      s"""WITH docs2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 37 = 0 THEN text || '$substrInjA'
        |         WHEN doc_id % 41 = 0 THEN text || '$substrInjB'
        |         ELSE text END AS text
        |  FROM documents
        |), pos AS (
        |  SELECT doc_id, text, unnest(range(len(text) - 23)) AS p
        |  FROM docs2 WHERE len(text) >= 24
        |), sel AS (
        |  SELECT doc_id, substr(text, p + 1, 24) AS g, min(p) AS p
        |  FROM pos
        |  WHERE substr(md5(substr(text, p + 1, 24)), 1, 1) IN ('0', '4', '8', 'c')
        |  GROUP BY doc_id, substr(text, p + 1, 24)
        |), dfok AS (
        |  SELECT g FROM sel GROUP BY g HAVING count(*) <= 200
        |), kept AS (
        |  SELECT s.doc_id, s.g, s.p FROM sel s JOIN dfok USING (g)
        |), shared AS (
        |  SELECT a.g, a.doc_id AS a_id, a.p AS pa, b.doc_id AS b_id, b.p AS pb
        |  FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
        |), spans AS (
        |  SELECT a_id, b_id, pa - pb AS off, min(pa) AS sa, min(pb) AS sb,
        |         max(pa) - min(pa) + 24 AS span
        |  FROM shared GROUP BY a_id, b_id, pa - pb
        |), vspans AS (
        |  SELECT s.a_id, s.b_id,
        |    CASE WHEN substr(da.text, s.sa + 1, s.span) = substr(db.text, s.sb + 1, s.span)
        |         THEN s.span ELSE 24 END AS vspan
        |  FROM spans s
        |  JOIN docs2 da ON da.doc_id = s.a_id
        |  JOIN docs2 db ON db.doc_id = s.b_id
        |), agg1 AS (
        |  SELECT a_id, b_id, count(DISTINCT g) AS n_anchors FROM shared GROUP BY a_id, b_id
        |), agg2 AS (
        |  SELECT a_id, b_id, max(vspan) AS max_span FROM vspans GROUP BY a_id, b_id
        |)
        |SELECT a.a_id, a.b_id,
        |  CAST(a.n_anchors AS BIGINT) AS n_anchors,
        |  CAST(g2.max_span AS BIGINT) AS max_span
        |FROM agg1 a JOIN agg2 g2 USING (a_id, b_id)
        |ORDER BY a_id, b_id""".stripMargin,
    "x14_neardup_clusters" ->
      s"""WITH RECURSIVE $invJaccardPairsSql, bidir AS (
        |  SELECT a_id AS src, b_id AS dst FROM pairs_j
        |  UNION SELECT b_id AS src, a_id AS dst FROM pairs_j
        |), reach AS (
        |  SELECT src, dst FROM bidir
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN bidir e ON r.dst = e.src
        |)
        |SELECT src AS doc_id, least(src, min(dst)) AS comp_id
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,
    "x15_hash_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(text), 1, 4) <
        |  CASE lang WHEN 'en' THEN '8000' WHEN 'es' THEN '4000'
        |            WHEN 'de' THEN '4000' WHEN 'fr' THEN '4000' ELSE 'g' END
        |ORDER BY doc_id""".stripMargin,
    "x18_repetition" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), ex AS (
        |  SELECT doc_id, unnest(toks) AS tok FROM tk
        |), top AS (
        |  SELECT doc_id, max(cnt) AS top_cnt FROM (
        |    SELECT doc_id, tok, count(*) AS cnt FROM ex GROUP BY doc_id, tok
        |  ) GROUP BY doc_id
        |), g AS (
        |  SELECT doc_id,
        |    len(toks) AS n_tok,
        |    CASE WHEN len(toks) >= 2 THEN [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] ELSE [] END AS g2,
        |    CASE WHEN len(toks) >= 3 THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)] ELSE [] END AS g3
        |  FROM tk
        |)
        |SELECT g.doc_id,
        |  round(CAST(top.top_cnt AS DOUBLE) / n_tok, 4) AS top_token_frac,
        |  round(CASE WHEN len(g2) > 0 THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) ELSE 0.0 END, 4) AS dup_2gram_frac,
        |  round(CASE WHEN len(g3) > 0 THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) ELSE 0.0 END, 4) AS dup_3gram_frac
        |FROM g JOIN top ON g.doc_id = top.doc_id
        |ORDER BY g.doc_id""".stripMargin,
    "x19_pii_scrub" ->
      """WITH injected AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or http://example' || doc_id
        |         || '.org call +1 555 000' || doc_id AS t
        |  FROM documents
        |), red AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM injected
        |), red2 AS (
        |  SELECT doc_id, n_emails,
        |    len(regexp_extract_all(t1, 'https?://[A-Za-z0-9./_-]+')) AS n_urls,
        |    regexp_replace(t1, 'https?://[A-Za-z0-9./_-]+', '<URL>', 'g') AS t2
        |  FROM red
        |), red3 AS (
        |  SELECT doc_id, n_emails, n_urls,
        |    len(regexp_extract_all(t2, '\+[0-9]+(?: ?[0-9]{2,}){2,}')) AS n_phones,
        |    regexp_replace(t2, '\+[0-9]+(?: ?[0-9]{2,}){2,}', '<PHONE>', 'g') AS t3
        |  FROM red2
        |)
        |SELECT doc_id, n_emails, n_urls, n_phones, md5(t3) AS red_md5
        |FROM red3 ORDER BY doc_id""".stripMargin,
    "x17_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
        |), flagged AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 21600000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), sess AS (
        |  -- CAST: DuckDB sum() yields HUGEINT, which duckdb.df() renders as
        |  -- float64 ("0.0" vs Spark's "0") and fails the driver's string hash.
        |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                  ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
        |  FROM flagged
        |)
        |SELECT user_id AS key, session_idx,
        |  min(ts_us) AS session_start, max(ts_us) AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY key, session_idx""".stripMargin,
    "x16_decontaminate" -> decontaminateOracle,
    // the bloom path must reproduce the broadcast path bit-for-bit
    "x21_decontaminate_bloom" -> decontaminateOracle,
    "x11_embed_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.45
        |ORDER BY a_id, b_id""".stripMargin,
    // x37: the oracle rebuilds each chunk with list_slice over the same
    // token list and the same integer ceil / floor-mapped boundaries; the
    // chunk TEXT is in the hash, so tokenization and joining must agree
    // byte-for-byte across engines.
    "x37_token_chunks" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), d AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |         CASE WHEN len(toks) <= 48 THEN 1
        |              ELSE (len(toks) - 48 + 31) // 32 + 1 END AS c
        |  FROM tk
        |), ch AS (
        |  SELECT doc_id, toks, n, unnest(range(c)) AS chunk_idx FROM d
        |)
        |SELECT doc_id,
        |  CAST(chunk_idx AS INTEGER) AS chunk_idx,
        |  CAST(least(48, n - chunk_idx * 32) AS INTEGER) AS n_chunk_tokens,
        |  array_to_string(
        |    list_slice(toks, chunk_idx * 32 + 1,
        |               chunk_idx * 32 + least(48, n - chunk_idx * 32)), ' ') AS chunk_text
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    // x38: plain unnest + GROUP BY + ORDER BY/LIMIT ground truth for the
    // TakeOrderedAndProject top-k; (cnt, gram) is a total order (grams are
    // unique), so the 50-row SET is deterministic on both engines.
    "x38_vocab_topk" ->
      """WITH tk AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), g AS (
        |  SELECT unnest(CASE WHEN len(toks) >= 2
        |                     THEN [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
        |                     ELSE [] END) AS gram
        |  FROM tk
        |)
        |SELECT gram, CAST(count(*) AS BIGINT) AS cnt
        |FROM g GROUP BY gram
        |ORDER BY cnt DESC, gram LIMIT 50""".stripMargin,
    // x39: first-occurrence novelty — min(doc_id) per distinct 3-shingle,
    // counted back by that minimum; integer ppm via // (the Spark side's
    // floor-form double division is exact at these magnitudes).
    "x39_ngram_novelty" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), s1 AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)])
        |    ELSE [] END AS sh
        |  FROM tk
        |), ex AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM s1
        |), firsts AS (
        |  SELECT shingle, min(doc_id) AS first_id FROM ex GROUP BY shingle
        |), novel AS (
        |  SELECT first_id AS doc_id, count(*) AS n_novel FROM firsts GROUP BY first_id
        |)
        |SELECT s1.doc_id,
        |  CAST(len(sh) AS INTEGER) AS n_shingles,
        |  CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
        |  CASE WHEN len(sh) > 0
        |       THEN CAST(coalesce(n_novel, 0) * 1000000 // len(sh) AS BIGINT) END AS novelty_ppm
        |FROM s1 LEFT JOIN novel USING (doc_id) ORDER BY doc_id""".stripMargin,
    // x42: the oracle computes the running token sum with the plain global
    // window Spark's two-phase shape avoids, then the same integer
    // offset*S div total shard cut; // is floor division on non-negative
    // BIGINTs, identical to Spark's `div`.
    "x42_token_shards" ->
      """WITH tk AS (
        |  SELECT doc_id, md5(text) AS h,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT *,
        |    sum(n_tok) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum_tok,
        |    sum(n_tok) OVER () AS total
        |  FROM tk
        |)
        |SELECT doc_id, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok,
        |  CAST(least(7, (cum_tok - n_tok) * 8 // total) AS INTEGER) AS shard
        |FROM c ORDER BY doc_id""".stripMargin,
    // x43: the oracle IS the one-phase groupBy-every-token twin the sketch
    // path avoids at scale; integer threshold (cnt*50 >= total) and integer
    // ppm division match Spark's div bit-for-bit.
    "x43_heavy_tokens" ->
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents WHERE length(trim(text)) > 0
        |), tot AS (SELECT count(*) AS n FROM tok)
        |SELECT token, count(*) AS cnt,
        |  count(*) * 1000000 // (SELECT n FROM tot) AS freq_ppm
        |FROM tok GROUP BY token
        |HAVING count(*) * 50 >= (SELECT n FROM tot)
        |ORDER BY cnt DESC, token""".stripMargin,
    // x44: x14's recursive-CTE closure for components + x12's quality
    // formula, then a window argmax (quality DESC, doc_id) per component —
    // singletons (no edges) cluster as themselves via the LEFT join.
    "x44_cluster_canonical" ->
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
        |), sc AS (
        |  SELECT doc_id,
        |    least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS len_score,
        |    (CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE) + 1.0)
        |      / (CAST(length(text) AS DOUBLE) + 1.0) AS alpha_ratio,
        |    least(CAST(len(list_filter(toks,
        |        t -> list_contains(['the','and','of','to','in','is','a'], t))) AS DOUBLE)
        |      / len(toks) * 10.0, 1.0) AS stop_score,
        |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        |  FROM tk
        |), q AS (
        |  SELECT doc_id,
        |    floor((0.3 * len_score + 0.3 * alpha_ratio + 0.2 * stop_score + 0.2 * ttr)
        |          * 10000 + 0.5) / 10000 AS quality
        |  FROM sc
        |), m AS (
        |  SELECT q.doc_id, coalesce(c.comp_id, q.doc_id) AS comp_id, q.quality
        |  FROM q LEFT JOIN comp c ON q.doc_id = c.doc_id
        |), r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY comp_id ORDER BY quality DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY comp_id) AS n_members
        |  FROM m
        |)
        |SELECT comp_id, doc_id AS keep_id, quality, n_members
        |FROM r WHERE rn = 1 ORDER BY comp_id""".stripMargin,
    "x45_fuzzy_editdist" ->
      """WITH v AS (SELECT DISTINCT p_brand AS s FROM part
        |           WHERE p_brand IS NOT NULL AND length(p_brand) >= 2)
        |SELECT a.s AS a_val, b.s AS b_val,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM v a JOIN v b ON a.s < b.s
        |WHERE levenshtein(a.s, b.s) <= 1
        |ORDER BY a_val, b_val""".stripMargin,
    "x47_zorder_zones" ->
      s"""WITH src AS (
         |  SELECT l_partkey % 1024 AS za, l_suppkey % 1024 AS zb FROM lineitem
         |), zc AS (
         |  SELECT za, zb, ($zorderInterleaveSql) AS z FROM src
         |)
         |SELECT z // 65536 AS zone, count(*) AS n_rows,
         |  min(za) AS min_a, max(za) AS max_a,
         |  min(zb) AS min_b, max(zb) AS max_b
         |FROM zc GROUP BY zone ORDER BY zone""".stripMargin,
    "x48_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type
        |), dev AS (
        |  SELECT e.event_type, e.value, m.med
        |  FROM events e JOIN med m USING (event_type)
        |), mad AS (
        |  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM dev GROUP BY event_type
        |)
        |SELECT d.event_type,
        |  round(min(d.med), 6) AS med,
        |  round(min(a.mad), 6) AS mad,
        |  count(*) AS n_total,
        |  count(*) FILTER (WHERE abs(d.value - d.med) * 10 > a.mad * 35) AS n_outliers
        |FROM dev d JOIN mad a USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin
  )
}
