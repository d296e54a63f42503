package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
}
