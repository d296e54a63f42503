package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style rule-cascade document filtering (Rae et al., "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * §A.1.1) — the cheap structural screens a curation pipeline runs before
  * any model-based quality scoring: token-count bounds, mean-word-length
  * bounds, and a stopword-presence check. Documents failing any rule are
  * flagged, not silently dropped: the audit shape (per-rule booleans +
  * the final keep) is what lets a pipeline owner see WHICH rule is doing
  * the cutting before committing to it — the same audit-first design as
  * the winsorization screen (x52).
  *
  * Scale design: pure map-side expression work — no shuffle, no state, no
  * UDF; every rule is integer arithmetic on token counts (mean length as
  * the cross-multiplied `lo·n ≤ 10·Σlen ≤ hi·n`, never a double ratio),
  * so the flags are bit-identical on any engine and safe in the driver's
  * rendered-string hash. The stopword check is `array_intersect` against
  * a tiny literal list (distinct-semantics on both Spark and DuckDB).
  */
object QualityFilter {

  /** Gopher rule set over whitespace tokens. Bounds are inclusive;
    * `meanLenLo10`/`meanLenHi10` are mean token length × 10 (integer —
    * e.g. 30 and 52 for [3.0, 5.2] chars/token).
    */
  def gopherFlags(
      docs: DataFrame,
      textCol: String = "text",
      minTokens: Long = 30L,
      maxTokens: Long = 90L,
      meanLenLo10: Long = 30L,
      meanLenHi10: Long = 52L,
      stopwords: Seq[String] = TextAnalysis.langMarkers.head._2,
      minDistinctStopwords: Long = 2L
  ): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val nTok = size(toks).cast("long")
    val sumChars =
      aggregate(toks, lit(0L), (acc: Column, t: Column) => acc + length(t).cast("long"))
    val nStop = size(array_intersect(toks, array(stopwords.map(lit): _*))).cast("long")
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("sum_token_chars", sumChars)
      .withColumn("n_stopwords", nStop)
      .withColumn(
        "pass_count",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn(
        "pass_meanlen",
        lit(meanLenLo10) * col("n_tokens") <= lit(10L) * col("sum_token_chars") &&
          lit(10L) * col("sum_token_chars") <= lit(meanLenHi10) * col("n_tokens"))
      .withColumn("pass_stop", col("n_stopwords") >= minDistinctStopwords)
      .withColumn("keep", col("pass_count") && col("pass_meanlen") && col("pass_stop"))
  }

  /** The filter itself: rows surviving every rule, original columns only. */
  def gopherFilter(
      docs: DataFrame,
      textCol: String = "text"
  ): DataFrame =
    gopherFlags(docs, textCol)
      .where(col("keep"))
      .select(docs.columns.map(col): _*)
}
