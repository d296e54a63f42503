package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Count-min-sketch frequency estimation — the approximate-counting twin
  * of the exact heavy-hitter pass ([[TextAnalysis]] x43) and the
  * [[DistinctSketch]] KMV estimator: when per-token exact counts would
  * ship one row per DISTINCT token per partition through the exchange
  * (open web vocabulary: URLs, hashes, typos — cardinality grows with the
  * corpus), the CMS ships a CONSTANT depth×width counter matrix per
  * group×partition instead, and answers point queries with the classic
  * one-sided guarantee est ≥ true, est ≤ true + 2N/width w.p.
  * ≥ 1 − 2^-depth.
  *
  * Reference scope: the reference pipeline has no sketches at all (its
  * whole corpus is one spreadsheet); this is a north-star extension for
  * the 100 TB curation engine, where "how often does this token/URL/domain
  * appear, roughly, in one pass" is a daily question.
  *
  * Determinism: the row-j cell of token t is hash40("j:" + t) mod width —
  * md5-derived like every other sampling/sketch decision in the engine —
  * so the matrix is a pure function of the data (partitioning-invariant:
  * merge is elementwise addition) and a SQL oracle replays every cell and
  * every estimate bit-for-bit.
  */
object FrequencySketch {

  /** Row-j 40-bit hash of a token, as a Column — MUST mirror the
    * aggregate's internal `hash40Scala(s"$j:$t")` (SketchSpec pins the
    * Column/Scala twins equal).
    */
  private def rowHash(j: Int, tok: Column): Column =
    DistinctSketch.hash40(concat(lit(s"$j:"), tok))

  /** Point-estimate of every probe token's corpus frequency from one
    * global CMS, next to the exact count, over a whitespace-tokenized
    * text corpus.
    *
    * Output: (token, exact_cnt, est_cnt, overestimate) — all BIGINT,
    * `overestimate = est_cnt - exact_cnt >= 0` always (the CMS one-sided
    * bound; SketchSpec pins it).
    *
    * Shape at scale:
    *   - building the sketch is ONE global aggregate whose partials are
    *     depth×width longs per partition — no per-token exchange;
    *   - the 1-row matrix is then broadcast-joined onto the probe set, so
    *     estimation is map-only over probes;
    *   - the probe set here is the corpus's own distinct vocabulary
    *     (bounded in the synthetic data) so the driver oracle can verify
    *     EVERY point query; production probes an explicit bounded list
    *     (the tokens you're investigating), keeping this join tiny while
    *     the corpus side stays one pass.
    */
  def cmsTokenCounts(
      docs: DataFrame,
      text: Column,
      depth: Int,
      width: Int
  ): DataFrame = {
    val toks = docs.select(TextAnalysis.tokens(text).as("toks"))

    // the finished matrix is depth×width longs of BOUNDED driver state
    // (the ivfCentroids / MisraGries candidate contract) — collect it and
    // inline as a literal, so estimation is a pure map over the probes
    // with no join of any kind (a 1-row crossJoin would plan an NLJ)
    val cmsArr: Seq[Long] = toks
      .agg(GraftFunctions.countMinTokens(col("toks"), depth, width).as("cms"))
      .head().getSeq[Long](0)
    val cmsLit = typedLit(cmsArr)

    val probes = toks
      .select(explode(col("toks")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("exact_cnt"))

    // est = min over rows j of cells[j*width + h_j(token)]
    val est = (0 until depth)
      .map(j =>
        element_at(cmsLit, (rowHash(j, col("token")) % width).cast("int") + lit(j * width) + lit(1)))
      .reduce(least(_, _))

    probes
      .select(
        col("token"),
        col("exact_cnt"),
        est.as("est_cnt"),
        (est - col("exact_cnt")).as("overestimate")
      )
  }
}
