package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: canonical BPE as an explicit list walk
    * (leftmost non-overlapping merge), no string encoding anywhere — the
    * operator's double-space replace trick must reproduce this exactly.
    */
  private def refBpe(docs: Seq[String], m: Int): Seq[(Int, String, String, String, Long, Long)] = {
    val wc = docs.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var words: Map[String, List[String]] = wc.keys.map(w => w -> w.split("").toList).toMap
    val out = Seq.newBuilder[(Int, String, String, String, Long, Long)]
    var it = 1
    var done = false
    while (it <= m && !done) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (w, syms) =>
        syms.zip(syms.drop(1)).foreach(p => pc(p) = pc.getOrElse(p, 0L) + wc(w))
      }
      if (pc.isEmpty) done = true
      else {
        val ((a, b), c) = pc.minBy { case ((x, y), n) => (-n, x + " " + y) }
        val merged = a + b
        words = words.map { case (w, syms) =>
          val res = List.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              res += merged; i += 2
            } else { res += syms(i); i += 1 }
          }
          w -> res.result()
        }
        val after = words.map { case (w, syms) => wc(w) * syms.length }.sum
        out += ((it, a, b, merged, c, after))
        it += 1
      }
    }
    out.result()
  }

  private def run(docs: Seq[String], m: Int) =
    Bpe.learnMerges(docs.toDF("text"), m)
      .orderBy($"iter")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
      .toSeq

  test("back-to-back pair occurrences merge canonically (the encoding trap)") {
    // "ababab": merging (a,b) must give [ab, ab, ab] — a naive
    // single-space string replace consumes the shared delimiter and
    // leaves [ab, a, b, a, b]. corpus_symbols_after exposes it: 3 vs 5.
    val docs = Seq("ababab")
    val got = run(docs, 1)
    assert(got === refBpe(docs, 1))
    assert(got.head._6 === 3L, s"back-to-back merge wrong: $got")
  }

  test("exact parity with the list-walk reference on a mixed corpus") {
    val docs = Seq(
      "low lower lowest low low",
      "new newer newest new",
      "wider wide wide",
      "aaaa baab abab"
    )
    (1 to 6).foreach { m =>
      assert(run(docs, m) === refBpe(docs, m), s"m=$m")
    }
  }

  test("tie-break is (count desc, pair asc) — deterministic") {
    // "xy" and "yz" both appear exactly twice: "xy" wins lexicographically
    val docs = Seq("xyq", "qxy", "yzp", "pyz")
    val got = run(docs, 1)
    assert(got === refBpe(docs, 1))
    assert((got.head._2, got.head._3) === (("x", "y")))
  }

  test("merge supply exhausts early: all-single-char corpus stops with no rows") {
    assert(run(Seq("a b c", "a b"), 3) === Seq.empty)
  }

  test("segmentWords: train ≡ encode — symbol totals and known segmentations") {
    val docs = Seq("low lower lowest low low", "new newer newest new", "wider wide wide")
    val learned = refBpe(docs, 4).map(m => (m._2, m._3))
    val seg = Bpe.segmentWords(docs.toDF("text"), learned)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getLong(3))))
      .toMap
    // encoding the training corpus with the learned merges must land on
    // exactly the symbol state training ended in
    val expectTotal = refBpe(docs, 4).last._6
    assert(seg.map { case (_, (cnt, _, n)) => cnt * n }.sum === expectTotal)
    // every word re-splits to its segmentation's symbols
    seg.foreach { case (w, (_, s, n)) =>
      assert(s.split(" ").length.toLong === n)
      assert(s.replace(" ", "") === w, s"segmentation loses characters for $w")
    }
  }

  test("segmentWords with no merges = character split") {
    val seg = Bpe.segmentWords(Seq("abc ab abc").toDF("text"), Seq.empty)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(seg.toSeq === Seq(("ab", 1L, "a b", 2L), ("abc", 2L, "a b c", 3L)))
  }

  test("encodeCorpus: doc-ordered token ids, frequency-ordered vocab, empty-token indexing") {
    // corpus: "ab ab ab c" ×2 docs — merge 1 is (a,b); vocab by weighted
    // count: ab=6, c=2 → ids ab=0, c=1
    val docs = Seq((1L, "ab ab ab c"), (2L, "ab ab ab c")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs.select($"text"), m = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges === Seq(("a", "b")))
    val enc = Bpe.encodeCorpus(docs, merges)
      .orderBy($"doc_id", $"pos", $"sub_pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val perDoc = Seq((0, 0, 0L), (1, 0, 0L), (2, 0, 0L), (3, 0, 1L))
    val expected = Seq(1L, 2L).flatMap(d => perDoc.map { case (p, sp, id) => (d, p, sp, id) })
    assert(enc.toSeq === expected)

    // with ZERO merges, a multi-char word fans out sub positions and the
    // vocab ranks single chars: a=6, b=6 → tie broken (count desc, sym
    // asc) → a=0, b=1, c=2
    val enc0 = Bpe.encodeCorpus(docs.where($"doc_id" === 1), Seq.empty)
      .orderBy($"pos", $"sub_pos")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(enc0.toSeq === Seq(
      (0, 0, 0L), (0, 1, 1L), (1, 0, 0L), (1, 1, 1L), (2, 0, 0L), (2, 1, 1L), (3, 0, 2L)))
  }

  test("result is partitioning-invariant") {
    val docs = (0 until 60).map(i => s"tok${i % 7} red${i % 3} blue${i % 5}")
    val base = run(docs, 3)
    val repart = Bpe.learnMerges(docs.toDF("text").repartition(13), 3)
      .orderBy($"iter").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(base === repart)
    assert(base === refBpe(docs, 3))
  }
}
