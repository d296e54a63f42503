package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Exact-substring deduplication — the dedup class that catches documents
  * sharing a long VERBATIM span (quoted boilerplate, licence blocks,
  * templated pages) that near-dup sketches dilute away when the rest of
  * the documents differ. The industry-standard single-node tool is a
  * suffix array over the concatenated corpus; the distributed re-expression
  * here is k-gram ANCHORS + same-offset EXTENSION:
  *
  *   1. Anchor mining (map-only): every k-char gram of every document,
  *      thinned by CONTENT-DEFINED selection — a gram is an anchor iff its
  *      md5's first nibble ≡ 0 (mod 4). Selection depends on gram BYTES,
  *      not position, so two documents sharing a span select identical
  *      anchors inside it regardless of alignment (the winnowing/CDC
  *      argument); expected shuffle volume drops 4× with a miss
  *      probability that decays geometrically in the span length
  *      ((3/4)^(L−k+1) for a span of length L). Per (doc, gram) only the
  *      FIRST position survives — self-repetitive documents ("ha ha ha…")
  *      cannot blow up the postings.
  *   2. Document-frequency prune: grams in more than `maxDf` docs (global
  *      boilerplate) are dropped BEFORE the quadratic step via the same
  *      groupBy + broadcast-anti-join shape as [[Dedup.ngramJaccardPairs]]
  *      (the hot set is ≤ |postings|/maxDf keys, so it broadcasts; no
  *      map-side-aggregation-free window anywhere).
  *   3. Candidate pairs join on the LITERAL GRAM STRING — hash collisions
  *      cannot create false anchors, so every emitted pair provably shares
  *      ≥ k verbatim chars.
  *   4. Extension: shared anchors of a pair are grouped by position OFFSET
  *      (pa − pb); anchors at one offset spanning [min(pa), max(pa)+k)
  *      are a candidate maximal span, VERIFIED by comparing the actual
  *      substrings (a span whose gap content diverges falls back to the
  *      per-anchor guarantee k). `max_span` is the longest verified span.
  *
  * Every step is deterministic string arithmetic reproducible in any SQL
  * engine — x31 carries a full DuckDB oracle. A production deployment
  * would swap the per-position md5 for a rolling (Karp-Rabin) hash with
  * the same selection semantics to make anchor mining cheaper per byte;
  * md5 is used here because the oracle engine can recompute it verbatim.
  */
object SubstringDedup {

  /** Pairs of documents sharing ≥1 verified k-gram anchor:
    * (a_id, b_id, n_anchors = distinct shared anchor grams,
    * max_span = longest substring-equality-verified same-offset span, ≥ k).
    */
  def anchorPairs(
      docs: DataFrame,
      k: Int,
      maxDf: Int = 100,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val base = Dedup
      .spread(docs.select(col(idCol), col(textCol)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // 1. content-defined anchor mining; first occurrence per (doc, gram)
    val anchors = base
      .where(length(col(textCol)) >= k)
      .select(
        col(idCol),
        explode(sequence(lit(0), length(col(textCol)) - k)).as("p"),
        col(textCol)
      )
      .select(col(idCol), col("p"), expr(s"substring($textCol, p + 1, $k)").as("g"))
      .where(substring(md5(col("g")), 1, 1).isin("0", "4", "8", "c"))
      .groupBy(col(idCol), col("g"))
      .agg(min(col("p")).as("p"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // 2. df-prune (rows are already one-per-doc-per-gram, so count = df)
    val hot = anchors
      .groupBy(col("g"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf)
      .select(col("g"))
    val kept = anchors.join(broadcast(hot), Seq("g"), "left_anti")
    // 3. exact candidate pairs on the literal gram
    val a = kept.select(col("g"), col(idCol).as("a_id"), col("p").as("pa"))
    val b = kept.select(col("g"), col(idCol).as("b_id"), col("p").as("pb"))
    val shared = a
      .join(b, Seq("g"))
      .where(col("a_id") < col("b_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // 4. same-offset spans, verified against the actual texts
    val spans = shared
      .groupBy(col("a_id"), col("b_id"), (col("pa") - col("pb")).as("off"))
      .agg(min(col("pa")).as("sa"), min(col("pb")).as("sb"), (max(col("pa")) - min(col("pa")) + k).as("span"))
      .join(base.select(col(idCol).as("a_id"), col(textCol).as("a_text")), "a_id")
      .join(base.select(col(idCol).as("b_id"), col(textCol).as("b_text")), "b_id")
      .select(
        col("a_id"),
        col("b_id"),
        when(
          expr("substring(a_text, sa + 1, span)") === expr("substring(b_text, sb + 1, span)"),
          col("span")
        ).otherwise(lit(k)).as("vspan")
      )
      .groupBy(col("a_id"), col("b_id"))
      .agg(max(col("vspan")).as("max_span"))
    shared
      .groupBy(col("a_id"), col("b_id"))
      .agg(countDistinct(col("g")).as("n_anchors"))
      .join(spans, Seq("a_id", "b_id"))
      .select(col("a_id"), col("b_id"), col("n_anchors"), col("max_span"))
  }

  /** Maximal shared TOKEN spans — the Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better") exact-substring
    * guarantee that [[anchorPairs]] approximates: EVERY maximal verbatim
    * run of ≥ `l` tokens shared by two documents is found, at ARBITRARY
    * offsets, with its exact positions and length. anchorPairs'
    * content-defined thinning trades a geometrically-small miss
    * probability for a 4× postings cut; this is the ZERO-MISS form — the
    * distributed re-expression of the suffix-array scan:
    *
    *   1. STRIDE-1 l-token grams — every position, the completeness
    *      precondition; rendered once per doc by rawNgrams, digested to
    *      a 16-byte md5 so the join shuffles digests, not 100+-byte gram
    *      strings (md5 equality ≡ text equality is the repo-wide x01
    *      exact-dedup contract);
    *   2. gram-digest equi-join, a<b ordered pairs: a pair sharing a
    *      span of S ≥ l tokens at (i, j) matches at EVERY (i+t, j+t),
    *      t ∈ [0, S−l] — all on ONE DIAGONAL d = pa − pb;
    *   3. diagonal islands: within (a, b, d), `pa − row_number` is
    *      constant exactly on a consecutive-pa run, so each island of m
    *      grams IS the maximal shared span of m + l − 1 tokens starting
    *      at (min pa, min pb).
    *
    * COMPLETENESS (spec-pinned against a brute-force reference): for a
    * maximal shared span a[i..i+S) = b[j..j+S), S ≥ l, every t ∈
    * [0, S−l] yields a matching gram on diagonal i−j, and maximality
    * means positions i−1 and i+S−l+1 do NOT match on that diagonal — so
    * the island is exactly [i, i+S−l] and the emitted row is (i, j, S).
    * Nothing is thinned, sampled, or df-pruned, so no span can be missed.
    *
    * 100 TB shape: one gram-digest exchange (the corpus token stream ×
    * 16 B) + one (a, b, diagonal)-keyed window bounded by a single
    * pair-diagonal's matched grams. The quadratic term Σ_g df(g)² is
    * real but is precisely the duplicated mass being mined: at `l` large
    * enough that incidental l-token collisions vanish (Lee et al. use
    * 50), candidate volume ≈ true duplication — the same argument the
    * single-node suffix-array tool makes. Deliberately NO maxDf prune: a
    * prune re-introduces the miss this operator exists to eliminate; a
    * boilerplate-heavy corpus that needs one wants [[anchorPairs]].
    *
    * Output: (a_id, b_id, a_start, b_start, span_tokens) per maximal
    * shared run, 0-based token offsets. Cross-document only (a < b);
    * intra-document self-repeats are out of scope (x55/x96 territory).
    */
  def maximalSharedSpans(
      docs: DataFrame,
      l: Int,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(l >= 2, s"span floor must be >= 2 tokens, got $l")
    // materialize the gram arrays BEFORE the generator (the §8.4
    // re-evaluation trap, same discipline as winnowFingerprints)
    val sized = Dedup
      .spread(docs.select(col(idCol), col(textCol)))
      .select(
        col(idCol),
        TextAnalysis.rawNgrams(TextAnalysis.tokens(col(textCol)), l).as("grams"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val grams = sized
      .select(col(idCol), posexplode(col("grams")).as(Seq("p", "g")))
      .select(col(idCol), col("p"), md5(col("g")).as("h"))
    val a = grams.select(col("h"), col(idCol).as("a_id"), col("p").as("pa"))
    val b = grams.select(col("h"), col(idCol).as("b_id"), col("p").as("pb"))
    val m = a
      .join(b, Seq("h"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("pa"), col("pb"))
    val w = Window
      .partitionBy(col("a_id"), col("b_id"), col("pa") - col("pb"))
      .orderBy(col("pa"))
    m
      .withColumn("isl", col("pa") - row_number().over(w))
      .groupBy(col("a_id"), col("b_id"), (col("pa") - col("pb")).as("d"), col("isl"))
      .agg(
        min(col("pa")).cast(LongType).as("a_start"),
        min(col("pb")).cast(LongType).as("b_start"),
        (count(lit(1)) + (l - 1)).cast(LongType).as("span_tokens"))
      .select(col("a_id"), col("b_id"), col("a_start"), col("b_start"), col("span_tokens"))
  }

  /** The APPLY half of exact-substring dedup (Lee et al. 2022 §4.1 —
    * after finding duplicated spans, REMOVE all but one occurrence from
    * the corpus): every document rebuilt with its losing span tokens cut
    * out. "Keep one copy" is the deterministic min-id rule: a span's
    * occurrence in the SMALLEST doc id survives, every other occurrence
    * (the b-side of each [[maximalSharedSpans]] pair, since a_id < b_id)
    * is removed — so a licence block quoted by 10 000 pages survives
    * exactly once, in the earliest page. Output text is the
    * token-normalized form (single-space joined — the span grid's own
    * coordinate system).
    *
    * Shape: span mining as [[maximalSharedSpans]]; losing intervals
    * merge per doc via the classic islands-over-running-max window (one
    * doc-keyed exchange; overlapping spans from DIFFERENT pairs fuse
    * here); the rebuild is map-side — each doc's merged interval list
    * (≤ spans-per-doc rows, collected per doc not per token) joins back
    * once, and the cut is a `filter`/`exists` pass over the token array
    * with positions, NO token-level join or re-sort.
    *
    * @return one row per input doc: doc_id, clean_text, n_tokens
    *         (original), n_removed_tokens
    */
  def removeSharedSpans(
      docs: DataFrame,
      l: Int,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val losing = maximalSharedSpans(docs, l, idCol, textCol)
      .select(
        col("b_id").as(idCol),
        col("b_start").as("s"),
        (col("b_start") + col("span_tokens")).as("e"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("s"), col("e"))
    val merged = losing
      .withColumn(
        "prev_max_e",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn(
        "new_isl",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1).otherwise(0))
      .withColumn("isl", sum(col("new_isl")).over(w))
      .groupBy(col(idCol), col("isl"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    val ivs = merged
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("ivs"))

    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .join(ivs, Seq(idCol), "left")
      .select(
        col(idCol),
        col("toks"),
        coalesce(col("ivs"), array().cast("array<struct<s:bigint,e:bigint>>")).as("ivs"))
      .select(
        col(idCol),
        filter(
          zip_with(
            col("toks"),
            sequence(lit(0L), size(col("toks")).cast("long") - 1),
            (t, i) => struct(t.as("t"), i.as("i"))),
          x => !exists(col("ivs"), iv => x("i") >= iv("s") && x("i") < iv("e"))
        ).as("kept"),
        size(col("toks")).cast("long").as("n_tokens"))
      .select(
        col(idCol),
        concat_ws(" ", transform(col("kept"), x => x("t"))).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("long").as("n_removed_tokens"))
  }
}
