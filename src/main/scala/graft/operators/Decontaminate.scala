package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag corpus documents that share word
  * n-grams with an evaluation set, the standard guard against test-set
  * leakage into training data.
  *
  * Scale design (100 TB posture): the eval side is always tiny relative to
  * the corpus (benchmarks are thousands of docs, the corpus is billions),
  * so its distinct gram set is BROADCAST — the corpus is touched in ONE
  * map-side pass (shingle → explode → broadcast-hash-join), and the only
  * shuffle is the final per-doc count aggregation, keyed by doc id with
  * map-side partial aggregation. Nothing quadratic, nothing resident.
  */
object Decontaminate {

  /** Per-corpus-doc overlap report against the eval set's n-gram universe.
    *
    * Output (only docs with ≥1 hit): (idCol, n_hit_grams, n_grams,
    * contamination) where `n_grams` is the doc's distinct-shingle count and
    * `contamination` = n_hit_grams / n_grams rounded to 4 dp. Callers drop
    * or review docs above a contamination threshold.
    */
  def overlap(
      corpus: DataFrame,
      evalSet: DataFrame,
      n: Int,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val evalGrams = evalSet
      .select(explode(TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), n)).as("gram"))
      .distinct()
    val corpusGrams = Dedup
      .spread(corpus.select(col(idCol), col(textCol)))
      .select(col(idCol), TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), n).as("sh"))
      // long, not int: aligns with BIGINT gram counts in SQL engines (the
      // DuckDB oracle) so hash-compares see identical dtypes
      .select(col(idCol), size(col("sh")).cast("long").as("n_grams"), explode(col("sh")).as("gram"))
    corpusGrams
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_hit_grams"))
      .select(
        col(idCol),
        col("n_hit_grams"),
        col("n_grams"),
        round(col("n_hit_grams").cast("double") / col("n_grams"), 4).as("contamination")
      )
  }
}
