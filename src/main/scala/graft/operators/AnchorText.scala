package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Anchor-text aggregation — per link TARGET, what the web calls it
  * (Brin & Page '98 §2.2: anchor text is propagated to the page it
  * points at; every production index aggregates it per target as a
  * relevance/description signal, and LLM-corpus pipelines use it as
  * page-title supervision). Consumes the (source doc, href, text) pair
  * stream that [[graft.functions.HtmlAnchors]] extracts.
  *
  * Output per target: `n_links` (total in-links), `n_src_docs`
  * (distinct linking documents — exact: a doc linking one target under
  * several texts counts once), `n_texts` (distinct anchor strings),
  * `top_text`/`top_cnt` (the plurality anchor string, ties broken
  * lexicographically — the [[Cluster.canonical]] argmax-by-struct trick:
  * ONE `min(struct(-cnt, text))` hash aggregation, no per-target window
  * or sort).
  *
  * Scale posture (100 TB): the text statistics are two keyed hash
  * aggregations — (target, text) counts, then target — and the exact
  * distinct-source count is a third, all map-side partial and all keyed
  * by the target, so AQE coalesces them onto one exchange footprint.
  * In-degree is Zipfian (a popular page has millions of in-links) but
  * per-key aggregation state is O(1) scalars, so skew costs task time,
  * never memory; no driver state at all.
  */
object AnchorText {

  /** Aggregate `(docCol, hrefCol, textCol)` pairs per target href. */
  def aggregate(
      pairs: DataFrame,
      hrefCol: String = "href",
      textCol: String = "text",
      docCol: String = "doc_id"
  ): DataFrame = {
    val perText = pairs
      .groupBy(col(hrefCol).as("target"), col(textCol).as("t"))
      .agg(count(lit(1)).as("cnt"))
    val perTarget = perText
      .groupBy(col("target"))
      .agg(
        sum(col("cnt")).as("n_links"),
        count(lit(1)).as("n_texts"),
        min(struct((-col("cnt")).as("nc"), col("t").as("t"))).as("top"))
    val docsPer = pairs
      .groupBy(col(hrefCol).as("target"))
      .agg(countDistinct(col(docCol)).as("n_src_docs"))
    perTarget
      .join(docsPer, Seq("target"))
      .select(
        col("target"),
        col("n_links"),
        col("n_src_docs"),
        col("n_texts"),
        col("top.t").as("top_text"),
        (-col("top.nc")).as("top_cnt"))
  }
}
