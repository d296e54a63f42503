package graft

import org.apache.spark.sql.functions._
import graft.operators.SubstringDedup

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Exact longest-common-substring length by DP — the ground truth the
    * anchor machinery's claims are checked against.
    */
  private def lcsLen(a: String, b: String): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    var best = 0
    for (i <- 1 to a.length; j <- 1 to b.length)
      if (a(i - 1) == b(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    best
  }

  private val shared60 = "The quick brown fox jumps over the lazy dog near the rivers."
  require(shared60.length == 60)

  test("docs sharing a 60-char span at different offsets pair up; span claims never exceed the true LCS") {
    val docs = Seq(
      (1L, "unique prefix alpha weather report today " + shared60 + " trailing content one"),
      (2L, "zz " + shared60 + " totally different tail about databases and storage"),
      (3L, "no overlap here at all: completely distinct content with other words entirely")
    ).toDF("doc_id", "text")
    val rows = SubstringDedup.anchorPairs(docs, k = 24, maxDf = 100).collect()
    val byPair = rows.map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getInt(3))).toMap
    assert(byPair.contains((1L, 2L)), s"planted pair missed: ${byPair.keySet}")
    val (nAnchors, maxSpan) = byPair((1L, 2L))
    assert(nAnchors >= 1)
    assert(maxSpan >= 24 && maxSpan <= lcsLen(
      "unique prefix alpha weather report today " + shared60 + " trailing content one",
      "zz " + shared60 + " totally different tail about databases and storage"))
    assert(!byPair.keySet.exists(p => p._1 == 3L || p._2 == 3L), "non-overlapping doc paired")
  }

  test("identical repetitive docs: first-occurrence anchors keep postings bounded, span covers the text") {
    val rep = "ha " * 100 + "ending marker text here"
    val docs = Seq((1L, rep), (2L, rep)).toDF("doc_id", "text")
    val rows = SubstringDedup.anchorPairs(docs, k = 24, maxDf = 100).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    // identical texts → the offset-0 span runs from the first to the last
    // anchor; with distinct grams in the tail it must extend beyond one gram
    assert(r.getInt(3) > 24)
    // self-repetition cannot blow up the anchor count: "ha ha …" has only a
    // handful of DISTINCT 24-grams, and only first occurrences survive
    assert(r.getLong(2) < 30, s"anchor count ${r.getLong(2)} suggests per-position postings")
  }

  test("grams above maxDf are boilerplate-pruned before the pair join") {
    val boiler = "this exact boilerplate sentence appears everywhere verbatim!"
    // padding must be pairwise substring-free: a repeated filler token
    // would itself create legitimate shared 24-grams below maxDf
    val docs = (1 to 6).map(i => (i.toLong, s"doc $i pad alpha$i beta${i * 7} gamma${i * 13} " + boiler))
      .toDF("doc_id", "text")
    // every shared gram lives in all 6 docs > maxDf=3 → nothing survives
    assert(SubstringDedup.anchorPairs(docs, k = 24, maxDf = 3).count() === 0L)
    // raising maxDf readmits them
    assert(SubstringDedup.anchorPairs(docs, k = 24, maxDf = 10).count() === 15L)
  }

  test("too-short docs never anchor") {
    val docs = Seq((1L, "short text"), (2L, "short text")).toDF("doc_id", "text")
    assert(SubstringDedup.anchorPairs(docs, k = 24, maxDf = 100).count() === 0L)
  }
}
