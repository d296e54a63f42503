package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.LinearModel

/** Property pin for the learned-inference hot path: the plain-JVM
  * expressions ([[graft.functions.FtBinaryDots]] /
  * [[graft.functions.FtMultiDots]]) must be BIT-IDENTICAL to the
  * Column-algebra HOF formulation (`classifyHof` — the documented spec)
  * on ADVERSARIAL text, not just corpus prose: the two paths duplicate
  * the trim → whitespace-split → unigram+bigram → hash40 pipeline in two
  * runtimes (UTF8String/JVM vs Catalyst expressions), and the places
  * they could drift are exactly the inputs a crawl delivers — empty
  * strings, runs of mixed whitespace (Java `\s` is [ \t\n\x0B\f\r];
  * NBSP/zero-width are NOT whitespace and must survive as token bytes),
  * leading/trailing separators (trim strips 0x20 ONLY), multi-byte
  * UTF-8 (CJK, emoji, combining marks) through the md5 bucketing.
  * Deterministically seeded (the CurationPropertySpec idiom).
  */
class FtDotsPropertySpec extends SparkSpec {
  import spark.implicits._

  // atoms chosen to hit every drift surface: 0x20 vs other \s, non-\s
  // unicode "spaces", multi-byte tokens, empties that only affect
  // tokenization at edges
  private val atoms: Seq[String] = Seq(
    " ", "  ", "\t", "\n", "\r", "\f", "",
    "\u00a0", "\u200b", "\u3000", // NBSP / zero-width / ideographic space: NOT Java \s
    "a", "Z", "0", "9", ".", ",", "-",
    "\u00e9", "\u00df", "\u00fc", // 2-byte UTF-8 letters
    "\u4e2d", "\u6587", "\u65e5\u672c\u8a9e", // CJK (3-byte)
    "\ud83d\ude42", "\ud83d\udc4d\ud83c\udffd", // emoji (4-byte, surrogate pairs)
    "e\u0301", // combining acute: looks like \u00e9, different bytes/feature
    "the", "word", "Data", "x131")

  private def textGen: Gen[String] =
    Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, Gen.oneOf(atoms)).map(_.mkString))

  private val models = Seq(
    LinearModel.planted("q", classes = 2, dim = 64),
    LinearModel.planted("m", classes = 4, dim = 32))

  test("expression path ≡ HOF algebra on adversarial random text (C = 2 and C = 4)") {
    val params = Gen.Parameters.default
    for (round <- 1 to 6) {
      val texts = (0 until 60)
        .map(i => textGen(params, Seed(round * 1000L + i)).get)
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      models.foreach { m =>
        val cols = (Seq("doc_id", "n_feats") ++ (0 until m.classes).map(c => s"dot$c"))
          .map(col)
        val fast = LinearModel.classify(df, "text", m)
          .select(cols: _*).collect().map(_.toSeq).toSet
        val hof = LinearModel.classifyHof(df, "text", m)
          .select(cols: _*).collect().map(_.toSeq).toSet
        assert(fast === hof,
          s"paths diverged at round $round, C=${m.classes} " +
            s"(diff: ${(fast diff hof).take(2)} vs ${(hof diff fast).take(2)})")
      }
    }
  }

  test("NULL text stays NULL through both paths (never a throw)") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b")))
      .toDF("doc_id", "text")
    models.foreach { m =>
      val fast = LinearModel.classify(df, "text", m)
        .select("doc_id", "n_feats").collect().map(r => (r.getLong(0), r.isNullAt(1))).toSet
      val hof = LinearModel.classifyHof(df, "text", m)
        .select("doc_id", "n_feats").collect().map(r => (r.getLong(0), r.isNullAt(1))).toSet
      assert(fast === hof)
      assert(fast.contains((1L, true)) && fast.contains((2L, false)))
    }
  }
}
