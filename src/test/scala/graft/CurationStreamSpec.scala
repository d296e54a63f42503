package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.streaming.CurationStream
import graft.streaming.CurationStream.Doc

/** The twelfth batch/stream twin: after every micro-batch, the
  * maintainer's selection must equal [[Curation.curate]] over every doc
  * delivered so far — including the case that makes incremental curation
  * non-trivial: a LATER batch delivering a smaller doc_id for an
  * already-kept text demotes the previous survivor and can flip which
  * source's quota the text occupies.
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  // real screen-passing docs from the test corpus (quality + language
  // rules are fiddly to satisfy by hand; the corpus already does)
  private lazy val passing: Seq[(Long, String, String)] = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    Curation
      .screened(docs)
      .join(docs, Seq("doc_id", "source"))
      .select(col("doc_id"), col("source"), col("text"))
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
  }

  private def batchSel(docs: Seq[Doc], cap: Int = 10): Set[(String, Long, String, Long)] =
    Curation
      .curate(
        docs.toDF("doc_id", "source", "text").select(col("doc_id"), col("source"), col("text")),
        cap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet

  private def streamSel(m: CurationStream.Maintainer): Set[(String, Long, String, Long)] =
    m.selection
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet

  test("selection ≡ batch curate after every micro-batch, demotions included") {
    assert(passing.size >= 12, s"need a dozen screen-passing docs, corpus gave ${passing.size}")
    val ds = passing.take(12)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val m = new CurationStream.Maintainer(spark, cap = 2)
    val query = CurationStream.start(input.toDS(), m)
    try {
      // batch 1: high-id DUPLICATE copies land first, claiming quota on a
      // synthetic source, plus a few originals
      val dup = ds.take(3).map { case (id, _, text) => Doc(9000 + id, "srcdup", text) }
      val b1 = dup ++ ds.slice(3, 6).map { case (id, s, t) => Doc(id, s, t) }
      input.addData(b1: _*)
      query.processAllAvailable()
      var prefix = b1
      assert(streamSel(m) === batchSel(prefix, cap = 2))

      // batch 2: the ORIGINAL low-id copies of batch 1's duplicates — the
      // md5 survivors demote to the originals (different source, so the
      // srcdup quota frees up), plus a failing doc (screened out)
      val b2 = ds.take(3).map { case (id, s, t) => Doc(id, s, t) } :+ Doc(7777, "srcdup", "x")
      input.addData(b2: _*)
      query.processAllAvailable()
      prefix ++= b2
      assert(streamSel(m) === batchSel(prefix, cap = 2))
      // the demotion actually happened: no 9000-range survivor remains
      assert(m.state.where(col("doc_id") >= 9000).isEmpty)

      // batch 3: more originals — quota pressure on real sources
      val b3 = ds.slice(6, 12).map { case (id, s, t) => Doc(id, s, t) }
      input.addData(b3: _*)
      query.processAllAvailable()
      prefix ++= b3
      assert(streamSel(m) === batchSel(prefix, cap = 2))
    } finally query.stop()
  }

  test("learned screen (x127 model) plugs in: selection ≡ curateWithModel after every batch") {
    import graft.operators.LinearModel
    val model = LinearModel.planted("q", 2, 512)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .orderBy(col("doc_id"))
      .collect()
      .map(r => Doc(r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    def modelBatchSel(ds: Seq[Doc]): Set[(String, Long, String, Long)] =
      LinearModel
        .curateWithModel(ds.toDF("doc_id", "source", "text"), model, keepClass = 1L, cap = 2)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
    val m = new CurationStream.Maintainer(
      spark, cap = 2, screen = LinearModel.modelScreened(_, model, keepClass = 1L))
    var prefix = Seq.empty[Doc]
    Seq(docs.take(20), docs.slice(20, 40), docs.slice(40, 60)).foreach { b =>
      m.update(b.toDF("doc_id", "source", "text"))
      prefix ++= b
      assert(streamSel(m) === modelBatchSel(prefix))
    }
    assert(streamSel(m).nonEmpty, "planted screen should keep a nonempty selection")
  }

  test("replayed batch is a no-op (idempotent fold)") {
    val ds = passing.take(4)
    val m = new CurationStream.Maintainer(spark, cap = 10)
    val batch = ds.map { case (id, s, t) => Doc(id, s, t) }.toDF()
    m.update(batch)
    val once = streamSel(m)
    val stateOnce = m.state.count()
    m.update(batch) // same batch re-delivered after a crash
    assert(streamSel(m) === once)
    assert(m.state.count() === stateOnce)
    assert(once === batchSel(ds.map { case (id, s, t) => Doc(id, s, t) }))
  }

  test("stateDir restart: a fresh Maintainer resumes the persisted survivors") {
    val ds = passing.take(8)
    val dir = java.nio.file.Files.createTempDirectory("graft_cur_state").toString
    val m1 = new CurationStream.Maintainer(spark, cap = 3, stateDir = Some(dir))
    assert(!m1.resumed)
    m1.update(ds.take(4).map { case (id, s, t) => Doc(id, s, t) }.toDF(), epochId = 0L)
    m1.update(ds.slice(4, 6).map { case (id, s, t) => Doc(id, s, t) }.toDF(), epochId = 1L)
    val before = streamSel(m1)

    // crash: a brand-new Maintainer against the same stateDir
    val m2 = new CurationStream.Maintainer(spark, cap = 3, stateDir = Some(dir))
    assert(m2.resumed)
    assert(streamSel(m2) === before)
    // replay of the last batch (offsets not committed) is a no-op
    m2.update(ds.slice(4, 6).map { case (id, s, t) => Doc(id, s, t) }.toDF(), epochId = 1L)
    assert(streamSel(m2) === before)
    // and the fold continues correctly across the restart
    m2.update(ds.slice(6, 8).map { case (id, s, t) => Doc(id, s, t) }.toDF(), epochId = 2L)
    assert(streamSel(m2) === batchSel(ds.map { case (id, s, t) => Doc(id, s, t) }, cap = 3))
  }

  test("direct-drive updates (default epochId) persist loadable epochs") {
    // outside a streaming query there is no epochId; EpochStore maps the
    // -1 default to latestCommitted + 1 so the persisted state is still
    // loadable (epoch "-1" would read back as a fresh dir)
    val ds = passing.take(4)
    val dir = java.nio.file.Files.createTempDirectory("graft_cur_direct").toString
    val m1 = new CurationStream.Maintainer(spark, cap = 5, stateDir = Some(dir))
    m1.update(ds.take(2).map { case (id, s, t) => Doc(id, s, t) }.toDF())
    m1.update(ds.slice(2, 4).map { case (id, s, t) => Doc(id, s, t) }.toDF())
    val m2 = new CurationStream.Maintainer(spark, cap = 5, stateDir = Some(dir))
    assert(m2.resumed)
    assert(streamSel(m2) === streamSel(m1))
  }

  test("mid-write crash (frames without marker) falls back one epoch and re-folds") {
    // the EpochStore crash matrix's third row: epoch N+1's frames are on
    // disk but the commit marker never landed — the loader must resume
    // from epoch N, and Spark's uncommitted offsets replay batch N+1,
    // whose re-fold restores exactly what was lost
    val ds = passing.take(6)
    val dir = java.nio.file.Files.createTempDirectory("graft_cur_crash").toString
    val m1 = new CurationStream.Maintainer(spark, cap = 5, stateDir = Some(dir))
    val b0 = ds.take(3).map { case (id, s, t) => Doc(id, s, t) }
    val b1 = ds.slice(3, 6).map { case (id, s, t) => Doc(id, s, t) }
    m1.update(b0.toDF(), epochId = 0L)
    val afterB0 = streamSel(m1)
    m1.update(b1.toDF(), epochId = 1L)
    // simulate the crash: epoch-1 frames persisted, marker gone
    assert(new java.io.File(dir, "commits/1").delete(), "marker should exist")

    val m2 = new CurationStream.Maintainer(spark, cap = 5, stateDir = Some(dir))
    assert(m2.resumed)
    assert(streamSel(m2) === afterB0, "loader did not fall back to epoch 0")
    // the replayed batch re-folds what was lost
    m2.update(b1.toDF(), epochId = 1L)
    assert(streamSel(m2) === batchSel(b0 ++ b1, cap = 5))
  }

  test("a fresh checkpoint replayed against old persisted state fails loudly") {
    // a streaming offset log never goes backward, so an epochId behind
    // the stateDir's committed epoch means the checkpoint was wiped while
    // the state survived — proceeding would silently lose folds (the new
    // epochs would GC themselves and the colliding epoch would no-op)
    val ds = passing.take(4)
    val dir = java.nio.file.Files.createTempDirectory("graft_cur_stale").toString
    val m1 = new CurationStream.Maintainer(spark, cap = 5, stateDir = Some(dir))
    m1.update(ds.take(2).map { case (id, s, t) => Doc(id, s, t) }.toDF(), epochId = 0L)
    m1.update(ds.slice(2, 4).map { case (id, s, t) => Doc(id, s, t) }.toDF(), epochId = 1L)
    val m2 = new CurationStream.Maintainer(spark, cap = 5, stateDir = Some(dir))
    intercept[IllegalStateException] {
      m2.update(ds.take(2).map { case (id, s, t) => Doc(id, s, t) }.toDF(), epochId = 0L)
    }
  }

  test("volatile maintainer with a checkpoint is refused") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    val m = new CurationStream.Maintainer(spark)
    val ck = java.nio.file.Files.createTempDirectory("graft_cur_ck").toString
    intercept[IllegalArgumentException] {
      CurationStream.start(input.toDS(), m, checkpoint = Some(ck))
    }
  }

  test("random batch cuts: prefix equality at every cut") {
    val rnd = new scala.util.Random(42)
    // shuffle and add duplicate texts under fresh ids so demotions and
    // quota flips happen at unpredictable cuts
    val base = rnd.shuffle(passing.take(20))
    val extra = base.take(6).map { case (id, _, text) => (5000 + id, "srcx", text) }
    val all = rnd.shuffle(base ++ extra).map { case (id, s, t) => Doc(id, s, t) }
    val cuts = Seq(7, 13, 19, all.size)
    val m = new CurationStream.Maintainer(spark, cap = 3)
    var from = 0
    for (to <- cuts) {
      m.update(all.slice(from, to).toDF())
      from = to
      assert(streamSel(m) === batchSel(all.take(to), cap = 3), s"diverged at cut $to")
    }
  }
}
