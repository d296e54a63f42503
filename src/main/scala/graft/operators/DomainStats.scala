package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-level corpus rollup and block-listing — the domain-granularity
  * curation pass every web pipeline runs before document-granularity
  * filters (C4 used a domain blocklist; RefinedWeb and Dolma both score
  * and drop whole hosts): a spam farm is cheapest to kill at its
  * domain, and host statistics (doc volume, mean length, language mix)
  * are the signal.
  *
  * Per host: `n_docs`, `tok_sum`, `avg_tok` (integer `div` — the x12
  * ppm rule), the plurality document language `top_lang` (ties
  * lexicographic — the one-aggregation `min(struct(-cnt, lang))`
  * argmax), and `blocked` = avg_tok < threshold (the thin-content-farm
  * rule; swap the predicate for a production policy).
  *
  * Scale posture: one (host, lang) hash aggregation carrying both the
  * counts and the token sums, one host-keyed reduction on top — both
  * map-side partial. Hosts are Zipfian but per-key state is O(1)
  * scalars. No driver state, no windows.
  */
object DomainStats {

  /** Roll up `(hostCol, langCol, tokCol)` document rows per host. */
  def rollup(
      docs: DataFrame,
      blockBelowAvgTok: Long,
      hostCol: String = "host",
      langCol: String = "lang",
      tokCol: String = "n_tok"
  ): DataFrame = {
    val perLang = docs
      .groupBy(col(hostCol), col(langCol).as("l"))
      .agg(count(lit(1)).as("cnt"), sum(col(tokCol)).as("tok"))
    perLang
      .groupBy(col(hostCol))
      .agg(
        sum(col("cnt")).as("n_docs"),
        sum(col("tok")).as("tok_sum"),
        min(struct((-col("cnt")).as("nc"), col("l").as("l"))).as("top"))
      .select(
        col(hostCol),
        col("n_docs"),
        col("tok_sum"),
        expr("tok_sum div n_docs").as("avg_tok"),
        col("top.l").as("top_lang"),
        (expr("tok_sum div n_docs") < blockBelowAvgTok).as("blocked"))
  }

  /** The corpus DATA CARD — the per-(source, language) summary table a
    * training-data release ships (Gebru et al. "Datasheets for
    * Datasets"; Dolma and RedPajama publish exactly this shape): volume
    * (docs/tokens/chars), exact-duplicate mass, emptiness, and length
    * envelope, every rate in exact integer ppm.
    *
    * Expects canonical columns (source, lang, text, n_chars, n_tokens).
    * Per stratum:
    *   - n_docs, n_tokens, n_chars — volumes
    *   - dup_docs — documents whose md5 digest appears more than once
    *     WITHIN the stratum (the mass exact dedup would touch);
    *     dup_ppm = dup_docs·10⁶ div n_docs
    *   - n_empty — whitespace-only documents
    *   - min/max/mean tokens (mean by integer div)
    *
    * Scale posture: digests are computed map-side and only (stratum,
    * digest) pairs shuffle (the x01 discipline — text never moves);
    * one digest-class aggregation, one stratum reduction on each
    * branch, joined on the stratum key. Strata are few; per-key state
    * is O(1) scalars.
    */
  def corpusReport(docs: DataFrame): DataFrame = {
    val keyed = docs.select(
      col("source"), col("lang"),
      md5(col("text")).as("digest"),
      col("n_chars"), col("n_tokens"),
      (length(trim(col("text"))) === 0).as("empty"))
    val dups = keyed
      .groupBy("source", "lang", "digest")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("source", "lang")
      .agg(
        sum(when(col("cnt") > 1L, col("cnt")).otherwise(0L)).as("dup_docs"),
        count(lit(1)).as("distinct_texts"))
    keyed
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        sum(when(col("empty"), 1L).otherwise(0L)).as("n_empty"),
        min("n_tokens").as("min_tokens"),
        max("n_tokens").as("max_tokens"))
      .join(dups, Seq("source", "lang"))
      .select(
        col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        col("n_chars"), col("distinct_texts"), col("dup_docs"),
        expr("dup_docs * 1000000L div n_docs").as("dup_ppm"),
        col("n_empty"),
        col("min_tokens"), col("max_tokens"),
        expr("n_tokens div n_docs").as("mean_tokens"))
  }
}
