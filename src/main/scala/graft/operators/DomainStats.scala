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
}
