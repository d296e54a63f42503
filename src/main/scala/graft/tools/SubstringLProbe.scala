package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{SubstringDedup, TextAnalysis}

/** Production-l probe for exact-substring dedup (r11 verdict #4): the
  * registered x114/x122 surfaces run at l=8 so the 12-token injected span
  * is minable by the oracle, but Lee et al. 2022 deduplicate at l=50 —
  * the regime where `maximalSharedSpans`' scaladoc argument (Σ_g df(g)² ≈
  * true duplicated mass, because incidental l-token collisions vanish as
  * l grows) actually bites. This probe MEASURES that argument on the raw
  * corpus (no injection — at l=50 a 12-token plant is invisible; what is
  * mined is the corpus's own duplication) at both l values:
  *
  *   - grams:      stride-1 gram instances (the exchange's input volume);
  *   - distinct:   distinct gram digests;
  *   - max_df:     the hottest gram's document frequency;
  *   - cand_pairs: Σ_g df·(df−1)/2 — the equi-join's emitted pair-gram
  *     volume, the term that could go quadratic;
  *   - spans/mass: emitted maximal spans and their Σ span_tokens — the
  *     TRUE duplicated mass the operator exists to find;
  *   - cand/mass:  the overhead ratio: candidate pair-grams per token of
  *     real duplication (small and FALLING with l = the Lee et al.
  *     argument holds; exploding = blow-up).
  *
  * Usage: runMain graft.tools.SubstringLProbe [sfDir] — one PROBE line
  * per l; results tabulated in SURVEY §8.12.
  */
object SubstringLProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "substring-l-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    Seq(8, 50).foreach { l =>
      // same gram stream the operator mines: stride-1 l-grams, digested
      val df_ = docs
        .repartition(spark.sparkContext.defaultParallelism)
        .select(TextAnalysis.rawNgrams(TextAnalysis.tokens(col("text")), l).as("grams"))
        .select(explode(col("grams")).as("g"))
        .select(md5(col("g")).as("d"))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("df"))
      val stats = df_
        .agg(
          sum(col("df")).as("grams"),
          count(lit(1)).as("distinct"),
          max(col("df")).as("max_df"),
          sum(col("df") * (col("df") - 1) / 2).as("cand_pairs"))
        .head()
      val grams = stats.getLong(0)
      val distinct = stats.getLong(1)
      val maxDf = stats.getLong(2)
      val candPairs = stats.getDouble(3).toLong

      val t0 = System.nanoTime()
      val spans = SubstringDedup
        .maximalSharedSpans(docs, l = l)
        .agg(count(lit(1)).as("n"), coalesce(sum(col("span_tokens")), lit(0L)).as("mass"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      val nSpans = spans.getLong(0)
      val mass = spans.getLong(1)
      val ratio = if (mass > 0) candPairs.toDouble / mass else Double.NaN
      println(
        f"PROBE l=$l%-3d grams=$grams%-10d distinct=$distinct%-10d max_df=$maxDf%-6d " +
          f"cand_pairs=$candPairs%-10d spans=$nSpans%-8d dup_mass=$mass%-10d " +
          f"cand/mass=$ratio%8.2f wall=$wall%7.2f s")
    }
    spark.stop()
  }
}
