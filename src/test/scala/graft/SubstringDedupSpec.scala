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

  /** Brute-force reference for maximalSharedSpans: all pairs, all
    * diagonals, maximal matching-token runs ≥ l — O(n²·len²), fine for
    * hand corpora.
    */
  private def bruteSpans(
      docs: Seq[(Long, String)],
      l: Int
  ): Set[(Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    (for {
      (a, b) <- docs.map(_._1).combinations(2).map(p => (p(0) min p(1), p(0) max p(1))).toSeq
      ta = toks(a); tb = toks(b)
      d <- -(tb.length - 1) to (ta.length - 1) // diagonal = ai - bi
      runs = {
        val pts = (0 until ta.length)
          .filter(i => i - d >= 0 && i - d < tb.length && ta(i) == tb(i - d))
        // maximal consecutive runs
        pts.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, i) if i == e + 1 => (s, i) :: rest
          case (acc, i) => (i, i) :: acc
        }
      }
      (s, e) <- runs if e - s + 1 >= l
    } yield (a, b, s.toLong, (s - d).toLong, (e - s + 1).toLong)).toSet
  }

  test("maximalSharedSpans: completeness + exactness vs brute force, arbitrary offsets") {
    val span = "one two three four five six seven eight nine ten" // 10 tokens
    val docs = Seq(
      (1L, "alpha beta gamma " + span + " delta epsilon"), // span at offset 3
      (2L, span + " zeta eta theta iota kappa"), // span at offset 0
      (3L, "pre1 pre2 pre3 pre4 pre5 pre6 pre7 " + span), // offset 7
      (4L, "totally different words nothing shared here with others at all really truly")
    )
    val got = SubstringDedup
      .maximalSharedSpans(docs.toDF("doc_id", "text"), l = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === bruteSpans(docs, 8))
    // the three planted offsets are all present, spans exactly 10 tokens
    assert(got.contains((1L, 2L, 3L, 0L, 10L)))
    assert(got.contains((1L, 3L, 3L, 7L, 10L)))
    assert(got.contains((2L, 3L, 0L, 7L, 10L)))
    assert(!got.exists(_._1 == 4L) && !got.exists(_._2 == 4L))
  }

  test("maximalSharedSpans: maximality (no sub-spans) and two disjoint spans emit two rows") {
    val s1 = "aa bb cc dd ee ff gg hh" // 8 tokens
    val s2 = "pp qq rr ss tt uu vv ww xx" // 9 tokens
    val docs = Seq(
      (1L, s1 + " filler1 filler2 " + s2),
      (2L, s2 + " mid1 mid2 mid3 " + s1)
    )
    val got = SubstringDedup
      .maximalSharedSpans(docs.toDF("doc_id", "text"), l = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // exactly the two maximal runs — no per-gram fragments of s2
    // (s1 starts at token 12 of doc 2: 9 span tokens + 3 mid tokens)
    assert(got === Set((1L, 2L, 0L, 12L, 8L), (1L, 2L, 10L, 0L, 9L)))
    assert(got === bruteSpans(docs, 8))
  }

  test("maximalSharedSpans: a run below l is never emitted; one of exactly l is") {
    val seven = "t1 t2 t3 t4 t5 t6 t7"
    val eight = seven + " t8"
    val docs = Seq(
      (1L, seven + " endA uniqA1 uniqA2"),
      (2L, seven + " endB uniqB1 uniqB2"),
      (3L, eight + " othC uniqC1"),
      (4L, eight + " othD uniqD1")
    )
    val got = SubstringDedup
      .maximalSharedSpans(docs.toDF("doc_id", "text"), l = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .toSet
    // (1,2) share only 7 tokens → absent; (3,4) share exactly 8 → present
    assert(!got.exists(t => t._1 == 1L && t._2 == 2L))
    assert(got.contains((3L, 4L, 8L)))
    // cross pairs (1,3)/(1,4)/(2,3)/(2,4) share the 7-token prefix only → absent
    assert(got.size === 1)
  }

  test("maximalSharedSpans: partitioning invariance") {
    val span = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    val docs = (1 to 20)
      .map(i => (i.toLong, s"head$i mid$i " + (if (i % 3 == 0) span + " " else "") + s"tail$i end$i"))
    val df1 = docs.toDF("doc_id", "text").repartition(1)
    val df8 = docs.toDF("doc_id", "text").repartition(8)
    def rows(df: org.apache.spark.sql.DataFrame) = SubstringDedup
      .maximalSharedSpans(df, l = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val r1 = rows(df1)
    assert(r1 === rows(df8))
    assert(r1.nonEmpty && r1.forall(_._5 === 9L))
  }

  test("removeSharedSpans: min-id keeps, losers cut, overlaps merge, untouched docs intact") {
    // an 8-token span shared by docs 1/2/3: doc 1 keeps it, 2 and 3 lose
    // it; doc 4 is unrelated and must come back verbatim (token-joined)
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two $span"),
      (2L, s"$span three four"),
      (3L, s"five $span six"),
      (4L, "quiet words that nobody repeats anywhere at all")
    ).toDF("doc_id", "text")
    val got = SubstringDedup.removeSharedSpans(docs, l = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === (("one two " + span, 10L, 0L)), "min-id doc must keep its copy")
    assert(got(2L) === (("three four", 10L, 8L)))
    assert(got(3L) === (("five six", 10L, 8L)))
    assert(got(4L) === (("quiet words that nobody repeats anywhere at all", 8L, 0L)))

    // overlapping losing spans merge: doc 20 shares [0,9) with doc 10 and
    // [1,10) with doc 11 — the union [0,10) is cut once, not double-counted
    val s10 = "a1 a2 a3 a4 a5 a6 a7 a8 a9"        // 9 tokens
    val s11 = "a2 a3 a4 a5 a6 a7 a8 a9 a10"       // 9 tokens, shifted by 1
    val docs2 = Seq(
      (10L, s"$s10 filler10 fillerx10"),
      (11L, s"$s11 filler11 fillerx11"),
      (20L, s"$s10 a10 tail20 tailx20")           // contains both spans
    ).toDF("doc_id", "text")
    val got2 = SubstringDedup.removeSharedSpans(docs2, l = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3))))
      .toMap
    assert(got2(20L) === (("tail20 tailx20", 10L)), "overlapping spans must merge to one cut")
    assert(got2(10L)._2 === 0L, "doc 10 is the min id of its pair — keeps")
  }
}
