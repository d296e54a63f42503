package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunk

/** Pins the fixed-stride chunking contract of [[Chunk.tokenWindows]]:
  * chunk count c = 1 if n <= window else ceil((n-window)/stride)+1, chunk i
  * covers [i*stride, min(i*stride+window, n)), every token covered, last
  * chunk possibly short, overlap = window - stride.
  */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, window: Int, stride: Int): Seq[(Int, Int, String)] =
    Chunk
      .tokenWindows(Seq((1L, text)).toDF("doc_id", "text"), window, stride)
      .orderBy($"chunk_idx")
      .select($"chunk_idx", $"n_chunk_tokens", $"chunk_text")
      .collect()
      .toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))

  test("short doc: single chunk, no padding") {
    assert(chunksOf("a b c", window = 5, stride = 3) === Seq((0, 3, "a b c")))
  }

  test("exact window length: still a single chunk") {
    assert(chunksOf("a b c d e", window = 5, stride = 3) === Seq((0, 5, "a b c d e")))
  }

  test("one token past the window starts a second (short) chunk") {
    assert(chunksOf("a b c d e f", window = 5, stride = 3) === Seq(
      (0, 5, "a b c d e"),
      (1, 3, "d e f") // overlap of window - stride = 2 tokens (d, e)
    ))
  }

  test("overlap and coverage over a longer doc") {
    val toks = (1 to 11).map(i => s"t$i")
    val out = chunksOf(toks.mkString(" "), window = 4, stride = 2)
    // c = ceil((11-4)/2)+1 = 5
    assert(out.map(_._1) === Seq(0, 1, 2, 3, 4))
    assert(out.map(_._2) === Seq(4, 4, 4, 4, 3))
    // chunk i covers tokens [2i, min(2i+4, 11))
    out.foreach { case (i, len, text) =>
      assert(text === toks.slice(2 * i, 2 * i + len).mkString(" "))
    }
    // union of chunk spans covers every token index exactly
    val covered = out.flatMap { case (i, len, _) => (2 * i) until (2 * i + len) }.toSet
    assert(covered === (0 until 11).toSet)
  }

  test("stride == window: disjoint chunks partition the doc") {
    val out = chunksOf((1 to 7).map("w" + _).mkString(" "), window = 3, stride = 3)
    assert(out === Seq((0, 3, "w1 w2 w3"), (1, 3, "w4 w5 w6"), (2, 1, "w7")))
  }

  test("chunk explosion is map-only: no Exchange in the plan") {
    val plan = Chunk
      .tokenWindows(Seq((1L, "a b c d e")).toDF("doc_id", "text"), 3, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
  }
}
