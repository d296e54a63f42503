package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Pca
import graft.streaming.PcaStream
import graft.streaming.PcaStream.Embedding

/** The nineteenth batch/stream twin — the spectral family's streaming
  * member, and the first with ADDITIVE constant-size state (the moment
  * sketch) instead of a growing distinct event set. The fold law is
  * BIGINT addition, so stream-folded moments must be BIT-EQUAL to a
  * batch IntGram over the union after every micro-batch — a stronger
  * equality than the event twins', and one that makes any double-fold
  * (in memory or on disk) a loud failure rather than a collapsed dupe.
  */
class PcaStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val all: Seq[(Long, Array[Float])] =
    spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq

  /** Reference moments in plain Scala — independent of IntGram. */
  private def refMoments(rows: Seq[(Long, Array[Float])]): (Long, Seq[Long], Seq[Long]) = {
    val q = rows.map(_._2.map(f => math.floor(f.toDouble * 1000).toLong))
    val dim = q.head.length
    val s = (0 until dim).map(d => q.map(_(d)).sum)
    val g = for (i <- 0 until dim; j <- i until dim)
      yield q.map(v => v(i) * v(j)).sum
    (q.size.toLong, s, g)
  }

  private def toDf(rows: Seq[(Long, Array[Float])]): DataFrame =
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))

  private def stateOf(m: PcaStream.Maintainer): (Long, Seq[Long], Seq[Long]) =
    (m.state.n, m.state.s.toSeq, m.state.g.toSeq)

  test("moments fold bit-equal to batch over every prefix; component ≡ batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Embedding]
    val m = new PcaStream.Maintainer(spark)
    val query = PcaStream.start(input.toDS(), m)
    try {
      var prefix = Seq.empty[(Long, Array[Float])]
      Seq(all.take(100), all.slice(100, 350), all.drop(350)).foreach { b =>
        input.addData(b.map { case (id, v) => Embedding(id, v) }: _*)
        query.processAllAvailable()
        prefix ++= b
        val (n, s, g) = refMoments(prefix)
        assert(stateOf(m) === ((n, s, g)))
        assert(m.component().toSeq ===
          Pca.powerIterate(n, s.toArray, g.toArray, 10).toSeq)
      }
    } finally query.stop()
  }

  test("replayed committed epoch is a full no-op (the additive guard)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_replay").toString
    val m = new PcaStream.Maintainer(spark, stateDir = Some(dir))
    m.update(toDf(all.take(50)), epochId = 0L)
    val once = stateOf(m)
    m.update(toDf(all.take(50)), epochId = 0L) // crash re-delivery
    assert(stateOf(m) === once, "replay double-folded the additive state")
    m.update(toDf(all.slice(50, 80)), epochId = 1L)
    assert(stateOf(m) === refMoments(all.take(80)))
  }

  test("stateDir restart + replay + continuation across a fresh Maintainer") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_state").toString
    val m1 = new PcaStream.Maintainer(spark, stateDir = Some(dir))
    assert(!m1.resumed)
    m1.update(toDf(all.take(200)), epochId = 0L)
    m1.update(toDf(all.slice(200, 350)), epochId = 1L)
    val before = stateOf(m1)

    val m2 = new PcaStream.Maintainer(spark, stateDir = Some(dir))
    assert(m2.resumed)
    assert(stateOf(m2) === before)
    m2.update(toDf(all.slice(200, 350)), epochId = 1L) // replay no-op
    assert(stateOf(m2) === before)
    m2.update(toDf(all.drop(350)), epochId = 2L)
    assert(stateOf(m2) === refMoments(all))
    assert(m2.component().toSeq === Pca.powerIterate(
      stateOf(m2)._1, stateOf(m2)._2.toArray, stateOf(m2)._3.toArray, 10).toSeq)
  }

  test("delta epochs compact: GC'd chain, restart over compact+delta sums exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_compact").toString
    val m1 = new PcaStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    m1.update(toDf(all.take(100)), epochId = 0L)      // delta
    m1.update(toDf(all.slice(100, 300)), epochId = 1L) // compact (merged)
    m1.update(toDf(all.drop(300)), epochId = 2L)       // delta
    assert(!new java.io.File(dir, "commits/0").exists, "epoch 0 should be GC'd")
    assert(new java.io.File(dir, "compacts/1").exists)
    val m2 = new PcaStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    assert(m2.resumed)
    // bit-equality here is the additive-correctness proof: any
    // double-count between the compact frame and a surviving delta
    // would shift the sums
    assert(stateOf(m2) === refMoments(all))
  }

  test("an epoch BEHIND the ledger throws loudly instead of silently dropping") {
    // the review regression: a >= replay guard would swallow epochs 0..N
    // when a fresh checkpoint runs against an old stateDir and serve a
    // component over a permanently partial corpus; only == is a replay,
    // behind must reach DeltaEpochStore.save's IllegalStateException
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_behind").toString
    val m = new PcaStream.Maintainer(spark, stateDir = Some(dir))
    m.update(toDf(all.take(30)), epochId = 0L)
    m.update(toDf(all.slice(30, 60)), epochId = 1L)
    val before = stateOf(m)
    val e = intercept[IllegalStateException] {
      m.update(toDf(all.slice(60, 90)), epochId = 0L) // fresh checkpoint, old state
    }
    assert(e.getMessage.contains("behind"))
    assert(stateOf(m) === before, "failed save must leave pre-batch state")
  }

  test("durable-committed but unfolded epoch resyncs from the store " +
    "instead of being skipped (save-throws-after-marker crash shape)") {
    // the r13 advice scenario: save() can fail AFTER its commit marker is
    // durable (e.g. during GC), so `moments` misses the epoch while the
    // ledger says committed. Reproduced here without fault injection: two
    // Maintainers share a stateDir; m1 advances the durable ledger to
    // epoch 1 while m2's in-memory fold is still at epoch 0 — exactly the
    // durable-ahead-of-memory state the crash leaves behind.
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_resync").toString
    val m1 = new PcaStream.Maintainer(spark, stateDir = Some(dir))
    m1.update(toDf(all.take(50)), epochId = 0L)
    val m2 = new PcaStream.Maintainer(spark, stateDir = Some(dir))
    assert(stateOf(m2) === refMoments(all.take(50)))
    m1.update(toDf(all.slice(50, 80)), epochId = 1L) // durable ledger → 1
    // m2 replays epoch 1: ledger says committed, but m2 never folded it.
    // A ledger-only guard would return with state stuck at epoch 0 forever
    // and the NEXT compaction would persist that loss durably.
    m2.update(toDf(all.slice(50, 80)), epochId = 1L)
    assert(stateOf(m2) === refMoments(all.take(80)),
      "replay of a durable-but-unfolded epoch must resync from the store")
    // and the stream continues normally from the resynced state
    m2.update(toDf(all.slice(80, 120)), epochId = 2L)
    assert(stateOf(m2) === refMoments(all.take(120)))
  }

  test("empty and NULL-bearing batches fold as zero, not as corruption") {
    val m = new PcaStream.Maintainer(spark)
    m.update(toDf(all.take(10)))
    val once = stateOf(m)
    m.update(toDf(Seq.empty))
    assert(stateOf(m) === once)
  }

  test("checkpoint without stateDir is refused") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Embedding]
    val m = new PcaStream.Maintainer(spark)
    val cp = java.nio.file.Files.createTempDirectory("graft_pca_cp").toString
    val e = intercept[IllegalArgumentException] {
      PcaStream.start(input.toDS(), m, checkpoint = Some(cp))
    }
    assert(e.getMessage.contains("stateDir"))
  }
}
