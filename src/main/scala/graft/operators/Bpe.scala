package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary learning — the merge-
  * table construction step of tokenizer training (Sennrich et al. 2016,
  * "Neural machine translation of rare words with subword units"): start
  * from characters, repeatedly merge the corpus-wide most frequent
  * adjacent symbol pair. The reference pipeline tokenizes by whitespace
  * only; a training-data engine that feeds an LLM needs the real thing.
  *
  * Scale shape: the corpus collapses to the WORD-COUNT table first (one
  * explode + map-side-partial hash aggregation — the x38 shape), so each
  * of the m iterations runs over vocabulary-sized data, not corpus-sized:
  *   - pair counting: map-side explode of adjacent symbol pairs weighted
  *     by word count + one hash aggregation;
  *   - winner selection: global argmax planned as TakeOrderedAndProject
  *     (per-partition heaps, ONE row to the driver per iteration — the
  *     ivfCentroids bounded-driver-state contract; (count desc, pair asc)
  *     total order makes ties deterministic);
  *   - merge application: map-only string replace, no shuffle;
  *   - per-iteration persist + localCheckpoint cuts the lineage like the
  *     CC/PageRank loops.
  *
  * Canonical-merge encoding (the part that makes a SQL oracle possible):
  * symbol sequences are stored as strings with TWO spaces between symbols
  * and at both ends ("␣␣t␣␣a␣␣b␣␣"), and a merge of (a, b) is the literal
  * replacement of " a␣␣b " (single flanking spaces) by " ab ". Each match
  * consumes ONE space from each side's double gap, so after a replacement
  * the scan position sits exactly before the next symbol's remaining
  * space — back-to-back occurrences ("a b a b") merge into ("ab ab"),
  * which the naive single-space encoding gets wrong because the shared
  * delimiter is consumed. Literal leftmost non-overlapping replace has
  * identical semantics in the JVM and in DuckDB, so the oracle replays
  * every iteration exactly: same pairs, same counts, same tie-breaks,
  * same segmentations.
  */
object Bpe {

  /** Adjacent-pair strings ("a b") of a symbols array column. */
  private def adjacentPairs(toks: org.apache.spark.sql.Column) =
    when(
      size(toks) >= 2,
      transform(
        sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2))
      )
    ).otherwise(array().cast("array<string>"))

  /** Learn the first `m` BPE merges over a whitespace-tokenized corpus.
    *
    * @return m rows: (iter, left, right, merged, pair_count,
    *         corpus_symbols_after) — iter 1-based, pair_count the weighted
    *         corpus frequency of the winning pair when it was chosen,
    *         corpus_symbols_after the total corpus symbol count once the
    *         merge is applied (monotonically decreasing by pair_count).
    */
  def learnMerges(
      docs: DataFrame,
      m: Int,
      textCol: String = "text"
  ): DataFrame = {
    require(m >= 1, s"m must be at least 1, got $m")
    val spark = docs.sparkSession

    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))

    // "  t  a  b  l  e  ": double-space separators (see scaladoc)
    var cur = words
      .select(
        col("w"), col("cnt"),
        concat(lit("  "), concat_ws("  ", split(col("w"), "")), lit("  ")).as("s"))
      .localCheckpoint(true)

    val merges = Seq.newBuilder[(Int, String, String, String, Long, Long)]
    var iter = 1
    var continue = true
    while (iter <= m && continue) {
      val top = cur
        .select(col("cnt"), adjacentPairs(split(trim(col("s")), "\\s+")).as("ps"))
        .select(col("cnt"), explode(col("ps")).as("pair"))
        .groupBy("pair")
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("pair"))
        .limit(1)
        .collect()
      if (top.isEmpty) {
        // every word is a single symbol — nothing left to merge
        continue = false
      } else {
        val pair = top(0).getString(0)
        val pc = top(0).getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        val merged = a + b
        // literal replace, not regexp_replace: merged symbols may contain
        // regex metachars in open corpora
        val applied = cur
          .withColumn("s",
            org.apache.spark.sql.functions.replace(
              col("s"), lit(s" $a  $b "), lit(s" $merged ")))
          .localCheckpoint(true)
        val after = applied
          .agg(sum(col("cnt") * size(split(trim(col("s")), "\\s+"))).as("n"))
          .head().getLong(0)
        cur.unpersist()
        cur = applied
        merges += ((iter, a, b, merged, pc, after))
        iter += 1
      }
    }
    cur.unpersist()

    import spark.implicits._
    merges.result()
      .toDF("iter", "left", "right", "merged", "pair_count", "corpus_symbols_after")
      .select(
        col("iter").cast("int").as("iter"),
        col("left"), col("right"), col("merged"),
        col("pair_count"), col("corpus_symbols_after"))
  }

  /** Apply a learned merge list to segment every distinct corpus word —
    * the ENCODE half of BPE: each merge replaces globally, in learned
    * order, exactly as training did (so training corpus words segment to
    * exactly the symbols training left them with).
    *
    * Map-only: the merge table is bounded driver state (m rows — the
    * learnMerges contract), folded into m chained literal replaces inside
    * one projection; no shuffle beyond the word-count aggregation itself.
    *
    * @param merges (left, right) pairs in application order
    * @return one row per distinct word: w, cnt, segmentation
    *         (single-space-joined symbols), n_subwords
    */
  def segmentWords(
      docs: DataFrame,
      merges: Seq[(String, String)],
      textCol: String = "text"
  ): DataFrame = {
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))

    val init = concat(lit("  "), concat_ws("  ", split(col("w"), "")), lit("  "))
    val folded = merges.foldLeft(init) { case (s, (a, b)) =>
      org.apache.spark.sql.functions.replace(s, lit(s" $a  $b "), lit(s" ${a + b} "))
    }
    words
      .withColumn("syms", split(trim(folded), "\\s+"))
      .select(
        col("w"), col("cnt"),
        concat_ws(" ", col("syms")).as("segmentation"),
        size(col("syms")).cast("long").as("n_subwords"))
  }
}
