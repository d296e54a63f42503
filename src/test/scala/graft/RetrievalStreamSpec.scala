package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, TextAnalysis}
import graft.streaming.RetrievalStream
import graft.streaming.RetrievalStream.Doc

/** The thirteenth batch/stream twin: after every micro-batch, the
  * maintainer's top-k must equal [[Retrieval.bm25TopK]] over every doc
  * delivered so far — including the property that makes incremental BM25
  * non-trivial: scores are GLOBAL (one new document moves N, totLen and
  * df), so a batch of documents that never match a query still reshuffles
  * that query's ranking.
  */
class RetrievalStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus: Seq[(Long, String)] = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))
    .where(col("text").isNotNull && length(col("text")) > 0)
    .orderBy(col("doc_id"))
    .limit(30)
    .collect()
    .map(r => (r.getLong(0), r.getString(1)))
    .toSeq

  // the x115 query shape: a few docs' first-4-token sets
  private lazy val queries: DataFrame = corpus
    .take(3)
    .map { case (id, _) => id }
    .toDF("query_id")
    .join(corpus.toDF("query_id", "text"), "query_id")
    .select(
      col("query_id"),
      slice(TextAnalysis.tokens(col("text")), 1, 4).as("terms"))

  private def rank(df: DataFrame): Set[(Long, Long, Long, Int)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet

  private def batchTopK(docs: Seq[(Long, String)], k: Int = 5): Set[(Long, Long, Long, Int)] =
    rank(Retrieval.bm25TopK(docs.toDF("doc_id", "text"), queries, k))

  test("topK ≡ batch bm25TopK after every micro-batch, global-score shifts included") {
    assert(corpus.size >= 30, s"need 30 docs, corpus gave ${corpus.size}")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val m = new RetrievalStream.Maintainer(spark)
    val query = RetrievalStream.start(input.toDS(), m)
    try {
      // batch 1: the query docs themselves plus a handful more
      val b1 = corpus.take(10)
      input.addData(b1.map { case (id, t) => Doc(id, t) }: _*)
      query.processAllAvailable()
      var prefix = b1
      assert(rank(m.topK(queries)) === batchTopK(prefix))

      // batch 2: ten MORE docs — N/totLen/df all move, every query's
      // scores shift even where its matched set didn't
      val b2 = corpus.slice(10, 20)
      input.addData(b2.map { case (id, t) => Doc(id, t) }: _*)
      query.processAllAvailable()
      prefix ++= b2
      assert(rank(m.topK(queries)) === batchTopK(prefix))

      // batch 3: near-duplicate copies of the query docs under new ids —
      // they contest the top ranks directly
      val b3 = corpus.take(5).map { case (id, t) => (5000 + id, t) } ++ corpus.slice(20, 25)
      input.addData(b3.map { case (id, t) => Doc(id, t) }: _*)
      query.processAllAvailable()
      prefix ++= b3
      assert(rank(m.topK(queries)) === batchTopK(prefix))
      // the planted copies actually rank (exact text match ⇒ top-k member)
      assert(rank(m.topK(queries)).exists(_._2 >= 5000))
    } finally query.stop()
  }

  test("replayed batch is a no-op (idempotent fold)") {
    val docs = corpus.take(8)
    val m = new RetrievalStream.Maintainer(spark)
    val batch = docs.toDF("doc_id", "text")
    m.update(batch)
    val once = rank(m.topK(queries))
    val stateOnce = m.state.count()
    m.update(batch) // same batch re-delivered after a crash
    assert(rank(m.topK(queries)) === once)
    assert(m.state.count() === stateOnce)
    assert(once === batchTopK(docs))
  }

  test("stateDir restart: a fresh Maintainer resumes the persisted postings") {
    val docs = corpus.take(16)
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_state").toString
    val m1 = new RetrievalStream.Maintainer(spark, stateDir = Some(dir))
    assert(!m1.resumed)
    m1.update(docs.take(8).toDF("doc_id", "text"), epochId = 0L)
    m1.update(docs.slice(8, 12).toDF("doc_id", "text"), epochId = 1L)
    val before = rank(m1.topK(queries))

    // crash: a brand-new Maintainer against the same stateDir
    val m2 = new RetrievalStream.Maintainer(spark, stateDir = Some(dir))
    assert(m2.resumed)
    assert(rank(m2.topK(queries)) === before)
    // replay of the last batch (offsets not committed) is a no-op
    m2.update(docs.slice(8, 12).toDF("doc_id", "text"), epochId = 1L)
    assert(rank(m2.topK(queries)) === before)
    // and the fold continues correctly across the restart
    m2.update(docs.slice(12, 16).toDF("doc_id", "text"), epochId = 2L)
    assert(rank(m2.topK(queries)) === batchTopK(docs))
  }

  test("mid-write crash (frames without marker) falls back one epoch and re-folds") {
    val docs = corpus.take(12)
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_crash").toString
    val m1 = new RetrievalStream.Maintainer(spark, stateDir = Some(dir))
    val b0 = docs.take(6)
    val b1 = docs.slice(6, 12)
    m1.update(b0.toDF("doc_id", "text"), epochId = 0L)
    val afterB0 = rank(m1.topK(queries))
    m1.update(b1.toDF("doc_id", "text"), epochId = 1L)
    // simulate the crash: epoch-1 frames persisted, marker gone
    assert(new java.io.File(dir, "commits/1").delete(), "marker should exist")

    val m2 = new RetrievalStream.Maintainer(spark, stateDir = Some(dir))
    assert(m2.resumed)
    assert(rank(m2.topK(queries)) === afterB0, "loader did not fall back to epoch 0")
    // the replayed batch re-folds what was lost
    m2.update(b1.toDF("doc_id", "text"), epochId = 1L)
    assert(rank(m2.topK(queries)) === batchTopK(docs))
  }

  test("delta epochs compact: old epochs GC, state survives compaction and further deltas") {
    val docs = corpus.take(20)
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_compact").toString
    val m1 = new RetrievalStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    m1.update(docs.take(5).toDF("doc_id", "text"), epochId = 0L)   // delta
    m1.update(docs.slice(5, 10).toDF("doc_id", "text"), epochId = 1L) // compact (1 - (-1) >= 2)
    m1.update(docs.slice(10, 15).toDF("doc_id", "text"), epochId = 2L) // delta
    // epoch 0 was GC'd by the compact at 1; 1 and 2 remain
    assert(!new java.io.File(dir, "commits/0").exists, "epoch 0 should be GC'd")
    assert(new java.io.File(dir, "compacts/1").exists, "epoch 1 should be a compact")
    assert(new java.io.File(dir, "commits/2").exists)
    // a restart over compact+delta equals the full batch build
    val m2 = new RetrievalStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    assert(m2.resumed)
    assert(rank(m2.topK(queries)) === batchTopK(docs.take(15)))
    // and folding continues — the next save compacts again (3 - 1 >= 2)
    m2.update(docs.slice(15, 20).toDF("doc_id", "text"), epochId = 3L)
    assert(new java.io.File(dir, "compacts/3").exists, "epoch 3 should compact")
    assert(!new java.io.File(dir, "commits/1").exists, "epoch 1 should be GC'd by compact 3")
    assert(rank(m2.topK(queries)) === batchTopK(docs))
    val m3 = new RetrievalStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    assert(rank(m3.topK(queries)) === batchTopK(docs))
  }

  test("checkpoint without stateDir is refused (silent empty-index restart)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val m = new RetrievalStream.Maintainer(spark)
    val cp = java.nio.file.Files.createTempDirectory("graft_bm25_cp").toString
    val e = intercept[IllegalArgumentException] {
      RetrievalStream.start(input.toDS(), m, checkpoint = Some(cp))
    }
    assert(e.getMessage.contains("stateDir"))
  }
}
