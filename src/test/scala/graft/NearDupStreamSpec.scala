package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup
import graft.streaming.NearDupStream
import graft.streaming.NearDupStream.Doc

/** The incremental band-index maintainer must reproduce the batch
  * MinHash-LSH near-dup operator over every document PREFIX — the twin
  * program's prefix-equality contract on its eleventh member, including
  * pairs whose two documents arrive in DIFFERENT micro-batches, exact
  * duplicates trickling into an existing class across batches, and late
  * members inheriting previously-verified rep pairs.
  */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def batchPairs(docs: Seq[(Long, String)]): Set[(Long, Long, Double)] =
    Dedup
      .minhashLshPairs(docs.toDF("doc_id", "text"), n = 3, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  private def streamPairs(m: NearDupStream.Maintainer): Set[(Long, Long, Double)] =
    m.pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  // ~12-token texts: a last-token edit keeps 9 of 11 distinct 3-grams
  // shared (jac ≈ 0.818 ≥ 0.5), and the (16×8) banding finds it
  private val t1 = "the quick brown fox jumps over the lazy dog again and again"
  private val t1b = "the quick brown fox jumps over the lazy dog again and often"
  private val t2 = "completely different content about spark streaming state maintenance here"
  private val t2b = "completely different content about spark streaming state maintenance now"
  private val short = "too short"

  test("pairs ≡ batch minhashLshPairs after every micro-batch, cross-batch pairs included") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val m = new NearDupStream.Maintainer(spark)
    val query = NearDupStream.start(input.toDS(), m)
    try {
      // batch 1: two unrelated docs — no pairs
      val b1 = Seq(Doc(1, t1), Doc(2, t2))
      input.addData(b1: _*)
      query.processAllAvailable()
      var prefix = b1.map(d => (d.doc_id, d.text))
      assert(streamPairs(m) === batchPairs(prefix))
      assert(streamPairs(m).isEmpty)

      // batch 2: a near-dup of doc 1 (cross-batch LSH pair) and an exact
      // copy of doc 1 (cross-batch class member → jac-1 pair + inherits
      // the near-dup pair with doc 3 via the rep-pair fan-out)
      val b2 = Seq(Doc(3, t1b), Doc(4, t1))
      input.addData(b2: _*)
      query.processAllAvailable()
      prefix ++= b2.map(d => (d.doc_id, d.text))
      assert(streamPairs(m) === batchPairs(prefix))
      assert(streamPairs(m).contains((1L, 4L, 1.0))) // exact dup, cross-batch
      assert(streamPairs(m).exists(p => p._1 == 1L && p._2 == 3L)) // near-dup, cross-batch

      // batch 3: a LATE member of class t1 (must inherit the verified
      // (t1, t1b) rep pair), a near-dup of doc 2, and an unshingleable doc
      val b3 = Seq(Doc(5, t1), Doc(6, t2b), Doc(7, short))
      input.addData(b3: _*)
      query.processAllAvailable()
      prefix ++= b3.map(d => (d.doc_id, d.text))
      assert(streamPairs(m) === batchPairs(prefix))
      assert(streamPairs(m).exists(p => p._1 == 3L && p._2 == 5L)) // late member × old rep pair
      assert(streamPairs(m).exists(p => p._1 == 2L && p._2 == 6L)) // second component
      assert(!streamPairs(m).exists(p => p._1 == 7L || p._2 == 7L)) // short doc never pairs

      // the index holds postings for DISTINCT shingleable texts only:
      // 4 distinct texts, 3 shingleable (t1, t1b variants + t2 family),
      // each with 16 bands
      val reps = m.index.select("rep_id").distinct().collect().map(_.getLong(0)).toSet
      assert(reps === Set(1L, 2L, 3L, 6L))
      assert(m.index.count() === 4L * 16L)
    } finally query.stop()
  }

  test("replayed batch is a no-op (idempotent fold)") {
    implicit val sqlCtx = spark.sqlContext
    val m = new NearDupStream.Maintainer(spark)
    val docs = Seq((1L, t1), (2L, t1b), (3L, t1)).toDF("doc_id", "text")
    // drive the fold directly (the streaming wrapper is exercised above)
    m.update(docs)
    val once = streamPairs(m)
    assert(once === batchPairs(Seq((1L, t1), (2L, t1b), (3L, t1))))
    m.update(docs) // same batch re-delivered after a crash
    assert(streamPairs(m) === once)
    assert(m.index.count() === 2L * 16L) // nothing re-banded
  }

  test("stateDir restart: a fresh Maintainer resumes the persisted index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ndup_state").toString
    val m1 = new NearDupStream.Maintainer(spark, stateDir = Some(dir))
    assert(!m1.resumed)
    m1.update(Seq((1L, t1), (2L, t2)).toDF("doc_id", "text"), epochId = 0L)
    m1.update(Seq((3L, t1b), (4L, t1)).toDF("doc_id", "text"), epochId = 1L)
    val before = streamPairs(m1)
    val idxBefore = m1.index.count()

    // crash: a brand-new Maintainer against the same stateDir
    val m2 = new NearDupStream.Maintainer(spark, stateDir = Some(dir))
    assert(m2.resumed)
    assert(streamPairs(m2) === before)
    assert(m2.index.count() === idxBefore)
    // replay of the last batch (offsets not committed) is a no-op
    m2.update(Seq((3L, t1b), (4L, t1)).toDF("doc_id", "text"), epochId = 1L)
    assert(streamPairs(m2) === before)
    // and the fold continues correctly across the restart — a late member
    // of class t1 inherits the verified (t1, t1b) rep pair from persisted
    // state
    m2.update(Seq((5L, t1)).toDF("doc_id", "text"), epochId = 2L)
    val prefix = Seq((1L, t1), (2L, t2), (3L, t1b), (4L, t1), (5L, t1))
    assert(streamPairs(m2) === batchPairs(prefix))
  }

  test("volatile maintainer with a checkpoint is refused") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val m = new NearDupStream.Maintainer(spark)
    val ck = java.nio.file.Files.createTempDirectory("graft_ndup_ck").toString
    intercept[IllegalArgumentException] {
      NearDupStream.start(input.toDS(), m, checkpoint = Some(ck))
    }
  }

  test("random corpus, random batch cuts: prefix equality at every cut") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    // clustered corpus: 8 base texts, each doc a light mutation of one
    val bases = Array.fill(8)(Array.fill(10)(vocab(rnd.nextInt(vocab.length))).toSeq)
    val docs = (1L to 40L).map { id =>
      val base = bases(rnd.nextInt(bases.length)).toArray
      if (rnd.nextBoolean()) base(rnd.nextInt(base.length)) = vocab(rnd.nextInt(vocab.length))
      (id, base.mkString(" "))
    }
    val cuts = Seq(9, 17, 28, 40)
    val input = MemoryStream[Doc]
    val m = new NearDupStream.Maintainer(spark)
    val query = NearDupStream.start(input.toDS(), m)
    try {
      var prev = 0
      cuts.foreach { c =>
        input.addData(docs.slice(prev, c).map { case (i, t) => Doc(i, t) }: _*)
        query.processAllAvailable()
        assert(streamPairs(m) === batchPairs(docs.take(c)), s"prefix $c diverged")
        prev = c
      }
    } finally query.stop()
  }
}
