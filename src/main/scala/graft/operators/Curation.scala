package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline (x120) as a reusable operator,
  * shared verbatim by the batch surface and the streaming maintainer
  * ([[graft.streaming.CurationStream]]) so the twins cannot drift: exact
  * dedup (min-id survivor per md5 — the x01 rule) → Gopher quality gate
  * (x58's integer cascade) → language-identifiability screen (x05's
  * marker argmax ≠ 'und') → per-source cap (x51's deterministic
  * md5-ordered quota), carrying x04's BPE-ish token count for budget
  * accounting.
  *
  * SCREEN-FIRST EQUIVALENCE (why the per-doc screens run before the
  * dedup window even though the reference order is dedup-first): quality,
  * language, and token count are pure functions of `text`, and every
  * member of an md5 class shares `text` — so a class passes or fails the
  * screens as a unit, and min-id over the class equals min-id over its
  * passing members whenever the class passes. Screening first therefore
  * keeps the RESULT identical while shrinking the md5 exchange to the
  * passing subset (252 of 500 docs at sf0.01; the same ratio is the
  * point at 100 TB, where the md5 shuffle is the pipeline's first big
  * exchange).
  *
  * Plan shape: map-side screens → md5-partition window (shuffle 1) →
  * source-partition window (shuffle 2); zero joins, zero collects.
  */
object Curation {

  /** The per-doc screens, map-side: quality-passing, language-identified
    * docs with their md5, language, and BPE-ish token count. Pure
    * projection + filter — no shuffle; this is the exact screen set both
    * twins apply, per row, once.
    */
  def screened(docs: DataFrame): DataFrame =
    QualityFilter
      .gopherFlags(docs)
      .where(col("keep"))
      .select(
        col("doc_id"), col("source"),
        md5(col("text")).as("text_md5"),
        TextAnalysis.langId(TextAnalysis.tokens(col("text"))).as("lang_pred"),
        TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("n_tokens"))
      .where(col("lang_pred") =!= "und")

  /** The batch pipeline: screens → min-id-per-md5 dedup window →
    * per-source cap window. Output: (source, doc_id, lang_pred,
    * n_tokens), the curated selection.
    */
  def curate(docs: DataFrame, cap: Int = 10): DataFrame =
    select(
      screened(docs)
        .withColumn(
          "rn_dup",
          row_number().over(Window.partitionBy(col("text_md5")).orderBy(col("doc_id"))))
        .where(col("rn_dup") === 1)
        .drop("rn_dup"),
      cap)

  /** The selection step alone — per-source top-`cap` by (text_md5,
    * doc_id) — over an already-deduped survivor table. Factored out so
    * the streaming maintainer derives its selection from maintained
    * state with the SAME window the batch plan uses.
    */
  private[graft] def select(survivors: DataFrame, cap: Int): DataFrame =
    survivors
      .withColumn(
        "rn_cap",
        row_number().over(
          Window.partitionBy(col("source")).orderBy(col("text_md5"), col("doc_id"))))
      .where(col("rn_cap") <= cap)
      .select(col("source"), col("doc_id"), col("lang_pred"), col("n_tokens"))
}
