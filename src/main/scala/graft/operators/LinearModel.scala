package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned-model inference as a first-class operator: a fastText-style
  * hashed-feature linear classifier (Joulin et al. 2016, "Bag of Tricks
  * for Efficient Text Classification"), the scorer CCNet-class curation
  * pipelines (Wenzek et al. 2019) run over every document for quality /
  * language labels — the one LLM-pipeline staple the heuristic screens
  * (x58 Gopher, x05 marker argmax) did not cover.
  *
  * INFERENCE, not training, is the pipeline operator: the model is
  * trained once offline and then applied to every document of a 100 TB
  * corpus, so the engine surface is "weights in, scores out". Weights
  * are driver-literal by construction (`classes × dim` integers — the
  * same bounded-driver-state contract as the BPE merge table), inlined
  * into the plan as array literals: the scoring pass is a map-only
  * projection with ZERO joins, zero shuffles, zero broadcast — the plan
  * a full-corpus scorer must have, because any per-document exchange at
  * 100 TB dwarfs the arithmetic. For dims too large to inline
  * (fastText's default 2M buckets), the same dot decomposes into an
  * explode + broadcast-join against a weights table; the literal form is
  * the right one for the distilled integer models this engine plants.
  *
  * EXACT-INTEGER REPLAYABILITY (the x91 discipline): every stage is
  * closed-form integer arithmetic —
  *
  *   - features: whitespace unigrams + adjacent bigrams, every
  *     OCCURRENCE kept (bag semantics, the fastText rule — no distinct);
  *   - bucket:  hash40("ft:" + feature) mod dim, the engine-wide
  *     md5-prefix integer ([[DistinctSketch.hash40]]);
  *   - weight:  w(c, b) planted as hash40("ftw:&lt;seed&gt;:c:b") mod 2001
  *     − 1000 ∈ [−1000, 1000] (the x91 plane formula), standing in for
  *     trained coefficients quantized to integers;
  *   - score:   per-class BIGINT dot Σ w(c, bucket(f)); argmax with the
  *     strict-`&gt;` keep rule (smallest class index wins ties);
  *   - margin:  (dot₁ − dot₀) / (1000 · max(n_feats, 1)) — one IEEE
  *     division of two exact integers, the length-normalized decision
  *     value (replayable bit-for-bit; the sigmoid calibration in
  *     [[sigmoidScore]] is for consumers and is spec-pinned, not
  *     oracled, because exp() is libm-dependent).
  *
  * A DuckDB hash match therefore certifies the ENTIRE inference path —
  * tokenization, bigram construction, feature hashing, weight lookup,
  * integer dot, tie rule — not just row counts.
  */
object LinearModel {

  /** A hashed-feature linear model: `weights(c)(b)` is the integer
    * coefficient of bucket `b` for class `c`. Driver-literal bounded
    * state: classes × dim longs (the planted x126 model: 2 × 512).
    */
  final case class HashedLinearModel(dim: Int, weights: Array[Array[Long]]) {
    require(weights.nonEmpty && weights.forall(_.length == dim),
      s"every class needs exactly dim=$dim weights")
    def classes: Int = weights.length
  }

  /** Deterministic planted weights — hash40("ftw:seed:c:b") mod 2001 −
    * 1000, the x91 plane-grid formula — standing in for an offline-
    * trained, integer-quantized model so the oracle can rebuild the
    * exact table closed-form.
    */
  def planted(seed: String, classes: Int, dim: Int): HashedLinearModel =
    HashedLinearModel(
      dim,
      Array.tabulate(classes, dim)((c, b) =>
        DistinctSketch.hash40Scala(s"ftw:$seed:$c:$b") % 2001L - 1000L))

  /** Unigrams ++ adjacent bigrams over a token array, every occurrence
    * kept (bag-of-features). Single-token docs contribute unigrams only.
    */
  def features(toks: Column): Column =
    concat(
      toks,
      when(
        size(toks) >= 2,
        transform(
          sequence(lit(0), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(2)))))
        .otherwise(array().cast("array<string>")))

  /** Feature → bucket: hash40("ft:" + f) mod dim (hash40 is a
    * non-negative 40-bit integer, so `%` is already the canonical mod).
    */
  def bucket(feat: Column, dim: Int): Column =
    DistinctSketch.hash40(concat(lit("ft:"), feat)) % lit(dim.toLong)

  /** Score `docs(textCol)` with `model`: appends
    * `n_feats` (BIGINT), `dot0..dot{C−1}` (BIGINT per-class dots),
    * `pred` (BIGINT argmax, smallest class on ties) and — for binary
    * models — `margin` (DOUBLE, (dot1 − dot0)/(1000·max(n_feats,1))).
    * Map-only: weights ride as array literals, no join, no shuffle.
    */
  def classify(docs: DataFrame, textCol: String, model: HashedLinearModel): DataFrame = {
    val withBuckets = docs.withColumn(
      "ft_buckets",
      transform(features(TextAnalysis.tokens(col(textCol))), f => bucket(f, model.dim)))
    val dotted = model.weights.zipWithIndex
      .foldLeft(withBuckets) { case (df, (w, c)) =>
        df.withColumn(
          s"dot$c",
          aggregate(
            col("ft_buckets"),
            lit(0L),
            (acc, b) => acc + element_at(typedLit(w.toSeq), (b + 1L).cast("int"))))
      }
      .withColumn("n_feats", size(col("ft_buckets")).cast("long"))
      .drop("ft_buckets")
    // argmax with the strict-> keep rule: class c beats the incumbent
    // only when strictly greater, so the smallest index wins ties
    val pred = (1 until model.classes).foldLeft((lit(0L), col("dot0"))) {
      case ((bestC, bestD), c) =>
        val d = col(s"dot$c")
        (when(d > bestD, lit(c.toLong)).otherwise(bestC), greatest(bestD, d))
    }._1
    val out = dotted.withColumn("pred", pred)
    if (model.classes == 2)
      out.withColumn(
        "margin",
        (col("dot1") - col("dot0")).cast("double") /
          (lit(1000.0) * greatest(col("n_feats"), lit(1L)).cast("double")))
    else out
  }

  /** Calibrated keep-probability for binary models: sigmoid of the
    * length-normalized margin. Consumer-facing (threshold screens);
    * spec-pinned against hand-computed values, deliberately NOT part of
    * any oracle hash (libm exp()).
    */
  def sigmoidScore(margin: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-margin))

  /** The model-screened curation front end — [[Curation.screened]] with
    * the Gopher heuristic cascade replaced by the learned screen
    * (pred == keepClass): the CCNet architecture, where a trained
    * classifier IS the quality gate. Language screen and token
    * accounting unchanged; same map-only shape (the classifier adds no
    * exchange), so [[Curation]]'s screen-first equivalence argument
    * carries over verbatim (pred is a pure function of `text`).
    */
  def modelScreened(docs: DataFrame, model: HashedLinearModel, keepClass: Long): DataFrame =
    classify(docs, "text", model)
      .where(col("pred") === keepClass)
      .select(
        col("doc_id"), col("source"),
        md5(col("text")).as("text_md5"),
        TextAnalysis.langId(TextAnalysis.tokens(col("text"))).as("lang_pred"),
        TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("n_tokens"))
      .where(col("lang_pred") =!= "und")

  /** The full learned-screen curation pipeline: model screen → min-id
    * md5 dedup → per-source cap, the x120 composition with the CCNet
    * scorer in the screen slot. Same two bounded shuffles, zero joins.
    */
  def curateWithModel(
      docs: DataFrame,
      model: HashedLinearModel,
      keepClass: Long = 1L,
      cap: Int = 10): DataFrame =
    Curation.select(
      modelScreened(docs, model, keepClass)
        .withColumn(
          "rn_dup",
          row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("text_md5"))
              .orderBy(col("doc_id"))))
        .where(col("rn_dup") === 1)
        .drop("rn_dup"),
      cap)
}
