package graft

import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("flags exactly the corpus docs sharing an n-gram with the eval set") {
    val evalSet = Seq(
      (100L, "what is the capital of france")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // contains "the capital of" and "capital of france" and "is the capital", "what is the"
      (1L, "everyone knows what is the capital of france these days"),
      // no 3-gram overlap
      (2L, "spark engines process parquet files in parallel"),
      // exact eval text embedded → heavy overlap
      (3L, "what is the capital of france")
    ).toDF("doc_id", "text")

    val out = Decontaminate.overlap(corpus, evalSet, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    assert(out.keySet === Set(1L, 3L))
    // doc 3 is the eval text verbatim: every one of its 4 shingles hits
    assert(out(3L) === ((4L, 4L, 1.0)))
    // doc 1 (10 tokens → 8 shingles), 4 of them from the eval text
    assert(out(1L)._1 === 4L)
    assert(out(1L)._2 === 8L)
    assert(out(1L)._3 === 0.5)
  }

  test("bloom-prefiltered path returns exactly the broadcast path's output") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(3)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    def doc(id: Long) =
      (id, (0 until 12).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val corpus = (1L to 40L).map(doc).toDF("doc_id", "text")
    val evalSet = (100L to 104L).map(doc).toDF("doc_id", "text")

    val exact = Decontaminate.overlap(corpus, evalSet, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val bloom = Decontaminate.overlapBloom(corpus, evalSet, n = 3, expectedGrams = 1000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(exact.nonEmpty) // the small vocab guarantees shared 3-grams
    assert(bloom === exact)
  }

  test("short docs (< n tokens) shingle empty and are never flagged") {
    val evalSet = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b"), (2L, "b c d and more tokens here")).toDF("doc_id", "text")
    val out = Decontaminate.overlap(corpus, evalSet, n = 3).collect()
    assert(out.map(_.getLong(0)).toSet === Set(2L))
  }
}
