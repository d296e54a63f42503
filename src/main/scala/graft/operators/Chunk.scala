package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window document chunking — the standard context-length prep step
  * of an LLM training pipeline (long documents are cut into model-window
  * pieces with an overlap so no span is only ever seen split across a
  * boundary).
  *
  * Deterministic fixed-stride contract (no RNG, no data-dependent state):
  * a document with n tokens yields c = 1 if n ≤ window else
  * ⌈(n − window) / stride⌉ + 1 chunks; chunk i covers tokens
  * [i·stride, min(i·stride + window, n)). Every token is covered, the
  * last chunk may be short, and consecutive chunks overlap by
  * (window − stride) tokens. All arithmetic is integer (the x17 lesson:
  * no doubles anywhere near a hash-compared contract).
  *
  * 100 TB shape: pure map-side — tokenize, posexplode a bounded
  * chunk-index sequence, slice, re-join. No shuffle at all; output row
  * count is Σ⌈·⌉ bounded by input tokens / stride. Parallelism is the
  * scan's, so long documents cost their own token count and nothing else.
  */
object Chunk {

  /** (idCol, chunk_idx, n_chunk_tokens, chunk_text) per window; see class
    * doc for the coverage contract. `window` > 0, 0 < `stride` ≤ `window`.
    */
  def tokenWindows(
      docs: DataFrame,
      window: Int,
      stride: Int,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window, "need 0 < stride <= window")
    val toks = TextAnalysis.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("toks"), size(toks).as("n"))
      .select(
        col(idCol),
        col("toks"),
        // integer ceil: c = 1 if n <= window else (n - window + stride - 1) div stride + 1
        // (floor of a positive int quotient; doubles are exact far beyond
        // these magnitudes and the value never reaches the output contract)
        when(col("n") <= window, lit(1))
          .otherwise(floor((col("n") - window + (stride - 1)) / stride).cast("int") + 1)
          .as("c"),
        col("n")
      )
      .select(
        col(idCol),
        explode(sequence(lit(0), col("c") - 1)).as("chunk_idx"),
        col("toks"),
        col("n")
      )
      .select(
        col(idCol),
        col("chunk_idx"),
        least(lit(window), col("n") - col("chunk_idx") * stride).as("n_chunk_tokens"),
        concat_ws(
          " ",
          slice(
            col("toks"),
            col("chunk_idx") * stride + 1,
            least(lit(window), col("n") - col("chunk_idx") * stride)
          )
        ).as("chunk_text")
      )
  }
}
