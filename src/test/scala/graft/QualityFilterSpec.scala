package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityFilter

class QualityFilterSpec extends SparkSpec {
  import spark.implicits._

  // crafted docs hitting each rule's boundary exactly
  private lazy val docs = Seq(
    // 30 tokens of 4 chars (mean 4.0), 2 distinct stopwords → keep
    (1L, (Seq("the", "and") ++ Seq.fill(28)("word")).mkString(" ")),
    // 29 tokens → fails count (inclusive lower bound is 30)
    (2L, (Seq("the", "and") ++ Seq.fill(27)("word")).mkString(" ")),
    // 91 tokens → fails count (inclusive upper bound is 90)
    (3L, (Seq("the", "and") ++ Seq.fill(89)("word")).mkString(" ")),
    // mean length 5.2 exactly (30 tokens, 156 chars) → passes meanlen at
    // the inclusive boundary: 10*156 == 52*30
    (4L, (Seq("the", "and") ++ Seq.fill(26)("abcde") ++ Seq.fill(2)("abcdefghij")).mkString(" ")),
    // mean length above 5.2 → fails meanlen
    (5L, (Seq("the", "and") ++ Seq.fill(28)("wordiest")).mkString(" ")),
    // stopword "the" repeated: 1 DISTINCT stopword → fails stop
    (6L, (Seq("the", "the", "the") ++ Seq.fill(27)("word")).mkString(" ")),
    // mean length below 3.0 → fails meanlen
    (7L, (Seq("the", "and") ++ Seq.fill(28)("ab")).mkString(" "))
  ).toDF("doc_id", "text")

  test("each rule flags its boundary exactly; keep is the conjunction") {
    val out = QualityFilter.gopherFlags(docs)
      .select("doc_id", "pass_count", "pass_meanlen", "pass_stop", "keep")
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    assert(out(1L) === ((true, true, true, true)))
    assert(out(2L) === ((false, true, true, false)))
    assert(out(3L) === ((false, true, true, false)))
    assert(out(4L)._2 === true) // inclusive 5.2 boundary
    assert(out(5L) === ((true, false, true, false)))
    assert(out(6L)._3 === false) // repeated stopword counts once
    assert(out(7L) === ((true, false, true, false)))
  }

  test("integer rule arithmetic: sum_token_chars and n_stopwords are exact") {
    val r = QualityFilter.gopherFlags(docs).where(col("doc_id") === 4L).head()
    assert(r.getAs[Long]("n_tokens") === 30L)
    assert(r.getAs[Long]("sum_token_chars") === 156L)
    assert(r.getAs[Long]("n_stopwords") === 2L)
  }

  test("gopherFilter keeps survivors with original columns only") {
    val kept = QualityFilter.gopherFilter(docs)
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
    assert(kept.collect().map(_.getLong(0)).toSet === Set(1L, 4L))
  }

  test("the cascade is map-only: no Exchange in the plan") {
    val p = QualityFilter.gopherFlags(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"quality flags should not shuffle:\n$p")
  }
}
