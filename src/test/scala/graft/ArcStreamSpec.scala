package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{LinearModel, WebArc}
import graft.streaming.ArcStream
import graft.streaming.ArcStream.Doc

/** The twenty-first batch/stream twin: after every micro-batch, the
  * maintainer's curated corpus must equal [[WebArc.pipeline]] (x146)
  * over every document delivered so far — including the two cases that
  * make incremental curation non-trivial: a later epoch's page
  * RETROACTIVELY near-dup-dropping a page kept epochs ago (greedy
  * keep-first is id-ordered, not arrival-ordered), and a later epoch
  * demoting an exact-dup survivor to a smaller page id (which can flip
  * the training label and the drop direction of its verified pairs).
  */
class ArcStreamSpec extends SparkSpec {
  import spark.implicits._

  private val ftModel = LinearModel.planted("q", classes = 2, dim = 512)
  private val keepAll = LinearModel.HashedLinearModel(
    8, Array(Array.fill(8)(0L), Array.fill(8)(1L)))

  private val baseText =
    "the quick brown fox jumps over lazy dogs and runs into the old barn " +
      "near town while birds sing songs about summer rain that falls onto " +
      "green fields during long quiet evenings"
  private val otherText =
    "the small grey cat sits under our wooden table and waits for warm milk " +
      "while rain taps gently onto the window glass during late autumn nights " +
      "as lamps glow softly inside the calm house"

  private lazy val corpus: Seq[Doc] = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("source"), col("text"))
    .where(col("doc_id") < 120)
    .collect()
    .map(r => Doc(r.getLong(0), r.getString(1), r.getString(2)))
    .toSeq

  private lazy val evalDf = corpus
    .filter(_.doc_id % 50 == 0)
    .map(_.text)
    .toDF("text")

  private def batchTwin(
      docs: Seq[Doc],
      model: LinearModel.HashedLinearModel = ftModel,
      eval: => org.apache.spark.sql.DataFrame = evalDf,
      minIsoPpm: Long = 500000L): Set[String] =
    WebArc
      .pipeline(
        docs.toDF("doc_id", "source", "text")
          .select(col("doc_id"), col("source"), col("text")),
        evalDocs = eval, model = model, minIsoPpm = minIsoPpm)
      .collect()
      .map(_.toString)
      .toSet

  private def streamView(m: ArcStream.Maintainer): Set[String] =
    m.curated().collect().map(_.toString).toSet

  test("curated ≡ batch x146 after every micro-batch over the real corpus") {
    assert(corpus.size >= 60)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val m = new ArcStream.Maintainer(spark, evalDf, ftModel)
    val query = ArcStream.start(input.toDS(), m)
    try {
      val batches = Seq(
        corpus.filter(_.doc_id % 3 == 0),
        corpus.filter(_.doc_id % 3 == 1),
        corpus.filter(_.doc_id % 3 == 2))
      var prefix = Seq.empty[Doc]
      for (b <- batches) {
        input.addData(b: _*)
        query.processAllAvailable()
        prefix ++= b
        assert(streamView(m) === batchTwin(prefix),
          s"stream diverged from batch after ${prefix.size} docs")
      }
    } finally query.stop()
  }

  test("cross-epoch retroactive near-dup drop: a later, smaller page " +
    "evicts a page kept epochs ago (keep-first is id-ordered, not " +
    "arrival-ordered)") {
    val m = new ArcStream.Maintainer(
      spark, Seq("zzz unused gram").toDF("text"), keepAll, minIsoPpm = 0L)
    assert(m.curated().isEmpty, "empty state must curate to an empty set")
    val b1 = Seq(Doc(6L, "s", baseText), Doc(101L, "s", otherText))
    m.update(b1.toDF("doc_id", "source", "text"))
    val after1 = m.curated().select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(after1 === Set(6L, 101L))
    // doc 2's page (id 8) is a near-dup of doc 6's page (id 24) — the
    // extracted texts differ only in the id decoration — and 8 < 24, so
    // the EARLIER-KEPT page must now drop
    val b2 = Seq(Doc(2L, "s", baseText))
    m.update(b2.toDF("doc_id", "source", "text"))
    val after2 = m.curated().select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(after2 === Set(2L, 101L), s"retroactive drop failed: $after2")
    // and the view still equals the batch twin over the union
    assert(streamView(m) ===
      batchTwin(b1 ++ b2, keepAll, Seq("zzz unused gram").toDF("text"), 0L))
  }

  test("replayed batch is a no-op (both folds idempotent)") {
    val m = new ArcStream.Maintainer(spark, evalDf, ftModel)
    val b = corpus.take(40)
    m.update(b.toDF("doc_id", "source", "text"))
    val once = streamView(m)
    m.update(b.toDF("doc_id", "source", "text"))
    assert(streamView(m) === once)
    assert(once === batchTwin(b))
  }

  test("stateDir restart: a fresh Maintainer resumes both stores and " +
    "keeps the twin contract") {
    val dir = java.nio.file.Files.createTempDirectory("arcstream").toString
    val b1 = corpus.filter(_.doc_id % 2 == 0)
    val b2 = corpus.filter(_.doc_id % 2 == 1)
    val m1 = new ArcStream.Maintainer(spark, evalDf, ftModel, stateDir = Some(dir))
    assert(!m1.resumed)
    m1.update(b1.toDF("doc_id", "source", "text"), epochId = 0L)
    val m2 = new ArcStream.Maintainer(spark, evalDf, ftModel, stateDir = Some(dir))
    assert(m2.resumed)
    m2.update(b2.toDF("doc_id", "source", "text"), epochId = 1L)
    assert(streamView(m2) === batchTwin(b1 ++ b2))
  }

  test("cross-store skew heals: the near-dup store one epoch ahead of " +
    "the arc store re-folds into agreement (the mid-update crash)") {
    val dir = java.nio.file.Files.createTempDirectory("arcskew").toString
    val b1 = corpus.take(30)
    val b2 = corpus.slice(30, 60)
    val m1 = new ArcStream.Maintainer(spark, evalDf, ftModel, stateDir = Some(dir))
    m1.update(b1.toDF("doc_id", "source", "text"), epochId = 0L)
    // simulate a crash AFTER the near-dup fold of epoch 1 but BEFORE the
    // arc frames were saved: only the inner maintainer sees batch 2
    val screened2 = WebArc.screenPages(WebArc.textPages(
      b2.toDF("doc_id", "source", "text")
        .select(col("doc_id"), col("source"), col("text"))))
    m1.nearDup.update(
      screened2.select(col("page_id").as("doc_id"), col("main_text").as("text")),
      epochId = 1L)
    // restart: arc store is at epoch 0, near-dup store at epoch 1; the
    // replayed batch re-folds (near-dup side no-ops on its guard)
    val m2 = new ArcStream.Maintainer(spark, evalDf, ftModel, stateDir = Some(dir))
    m2.update(b2.toDF("doc_id", "source", "text"), epochId = 1L)
    assert(streamView(m2) === batchTwin(b1 ++ b2))
  }

  test("volatile maintainer with a checkpoint is refused") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val m = new ArcStream.Maintainer(spark, evalDf, ftModel)
    val e = intercept[IllegalArgumentException] {
      ArcStream.start(input.toDS(), m, checkpoint = Some("/tmp/arcstream-ckpt"))
    }
    assert(e.getMessage.contains("memory-only"))
  }
}
