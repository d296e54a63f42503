package graft

import graft.operators.DomainStats

class CorpusReportSpec extends SparkSpec {
  import spark.implicits._

  test("data card on a hand-built corpus: volumes, dup mass, empties, envelope") {
    // stratum (a, en): 4 docs, two sharing a text (dup mass 2), one empty
    // stratum (a, de): 1 doc
    // stratum (b, en): 3 docs, ALL the same text (dup mass 3)
    val docs = Seq(
      ("a", "en", "hello world", 11L, 2L),
      ("a", "en", "hello world", 11L, 2L),
      ("a", "en", "unique text here", 16L, 3L),
      ("a", "en", "   ", 3L, 1L),
      ("a", "de", "hallo welt", 10L, 2L),
      ("b", "en", "same", 4L, 1L),
      ("b", "en", "same", 4L, 1L),
      ("b", "en", "same", 4L, 1L)
    ).toDF("source", "lang", "text", "n_chars", "n_tokens")
    val out = DomainStats.corpusReport(docs)
      .orderBy("source", "lang")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r)
      .toMap

    val aEn = out(("a", "en"))
    assert(aEn.getLong(2) === 4L)  // n_docs
    assert(aEn.getLong(3) === 8L)  // n_tokens
    assert(aEn.getLong(4) === 41L) // n_chars
    assert(aEn.getLong(5) === 3L)  // distinct_texts
    assert(aEn.getLong(6) === 2L)  // dup_docs: the two "hello world"s
    assert(aEn.getLong(7) === 500000L) // dup_ppm = 2/4
    assert(aEn.getLong(8) === 1L)  // n_empty: whitespace-only doc
    assert(aEn.getLong(9) === 1L && aEn.getLong(10) === 3L) // min/max tokens
    assert(aEn.getLong(11) === 2L) // mean = 8 div 4

    val aDe = out(("a", "de"))
    assert(aDe.getLong(2) === 1L && aDe.getLong(6) === 0L && aDe.getLong(7) === 0L)

    val bEn = out(("b", "en"))
    assert(bEn.getLong(5) === 1L)       // one distinct text
    assert(bEn.getLong(6) === 3L)       // ALL three count as dup mass
    assert(bEn.getLong(7) === 1000000L) // dup_ppm = 3/3
  }

  test("duplicate texts in DIFFERENT strata are not cross-stratum dups") {
    val docs = Seq(
      ("a", "en", "shared", 6L, 1L),
      ("b", "en", "shared", 6L, 1L)
    ).toDF("source", "lang", "text", "n_chars", "n_tokens")
    DomainStats.corpusReport(docs).collect().foreach { r =>
      assert(r.getLong(6) === 0L, s"stratum ${r.getString(0)} counted a cross-stratum dup")
    }
  }
}
