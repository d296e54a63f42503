package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{LinearModel, MediaArc}
import graft.streaming.MediaArcStream
import graft.streaming.MediaArcStream.Doc

/** The twenty-second batch/stream twin: after every micro-batch, the
  * maintainer's fused (image, curated text) pairs must equal
  * [[MediaArc.pipeline]] (x150) over every document delivered so far —
  * both modality routes incremental, the image near-dup's greedy
  * keep-first preserved across epochs in BOTH directions (a later
  * smaller-id image retroactively evicts an image kept epochs ago).
  */
class MediaArcStreamSpec extends SparkSpec {
  import spark.implicits._

  private val ftModel = LinearModel.planted("q", classes = 2, dim = 512)
  private val keepAll = LinearModel.HashedLinearModel(
    8, Array(Array.fill(8)(0L), Array.fill(8)(1L)))

  private val baseText =
    "the quick brown fox jumps over lazy dogs and runs into the old barn " +
      "near town while birds sing songs about summer rain that falls onto " +
      "green fields during long quiet evenings"

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
    MediaArc
      .pipeline(
        docs.toDF("doc_id", "source", "text")
          .select(col("doc_id"), col("source"), col("text")),
        evalDocs = eval, model = model, minIsoPpm = minIsoPpm)
      .collect()
      .map(_.toString)
      .toSet

  private def streamView(m: MediaArcStream.Maintainer): Set[String] =
    m.curated().collect().map(_.toString).toSet

  test("curated pairs ≡ batch x150 after every micro-batch over the real corpus") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val m = new MediaArcStream.Maintainer(spark, evalDf, ftModel)
    val query = MediaArcStream.start(input.toDS(), m)
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

  test("cross-epoch retroactive image drop: the odd doc's GIF twin is " +
    "kept alone, then evicted when the even doc's smaller-id BMP lands") {
    val m = new MediaArcStream.Maintainer(
      spark, Seq("zzz unused gram").toDF("text"), keepAll, minIsoPpm = 0L)
    assert(m.curated().isEmpty)
    // doc 3 first: its imgs 6 (GIF, pid 2) and 7 (BMP, pid 3) are kept
    m.update(Seq((3L, "s", baseText)).toDF("doc_id", "source", "text"))
    val after1 = m.curated().select(col("img_id")).collect().map(_.getLong(0)).toSet
    assert(after1.contains(6L))
    // doc 2's img 4 (BMP, pid 2) is pixel-identical to img 6 and has the
    // smaller id — the earlier-kept GIF must now drop, cross-format
    m.update(Seq((2L, "s", baseText)).toDF("doc_id", "source", "text"))
    val after2 = m.curated().select(col("img_id")).collect().map(_.getLong(0)).toSet
    assert(after2.contains(4L) && !after2.contains(6L), after2.toString)
    assert(streamView(m) === batchTwin(
      Seq(Doc(3L, "s", baseText), Doc(2L, "s", baseText)),
      keepAll, Seq("zzz unused gram").toDF("text"), 0L))
  }

  test("replayed batch is a no-op (all three image folds idempotent)") {
    val m = new MediaArcStream.Maintainer(spark, evalDf, ftModel)
    val b = corpus.take(40)
    m.update(b.toDF("doc_id", "source", "text"))
    val once = streamView(m)
    m.update(b.toDF("doc_id", "source", "text"))
    assert(streamView(m) === once)
    assert(once === batchTwin(b))
  }

  test("stateDir restart resumes all three stores") {
    val dir = java.nio.file.Files.createTempDirectory("mediaarc").toString
    val b1 = corpus.filter(_.doc_id % 2 == 0)
    val b2 = corpus.filter(_.doc_id % 2 == 1)
    val m1 = new MediaArcStream.Maintainer(spark, evalDf, ftModel, stateDir = Some(dir))
    assert(!m1.resumed)
    m1.update(b1.toDF("doc_id", "source", "text"), epochId = 0L)
    val m2 = new MediaArcStream.Maintainer(spark, evalDf, ftModel, stateDir = Some(dir))
    assert(m2.resumed)
    m2.update(b2.toDF("doc_id", "source", "text"), epochId = 1L)
    assert(streamView(m2) === batchTwin(b1 ++ b2))
  }

  test("clip-route twins: curatedAudio ≡ x154 and curatedVideo ≡ x156 " +
    "over the union after every micro-batch, folds idempotent") {
    val m = new MediaArcStream.Maintainer(spark, evalDf, ftModel)
    val batches = Seq(
      corpus.filter(_.doc_id % 3 == 0),
      corpus.filter(_.doc_id % 3 == 1),
      corpus.filter(_.doc_id % 3 == 2))
    var prefix = Seq.empty[Doc]
    for (b <- batches) {
      m.update(b.toDF("doc_id", "source", "text"))
      prefix ++= b
      val unionDf = prefix.toDF("doc_id", "source", "text")
        .select(col("doc_id"), col("source"), col("text"))
      assert(m.curatedAudio().collect().map(_.toString).toSet ===
        MediaArc.audioRoute(unionDf).collect().map(_.toString).toSet,
        s"audio twin diverged after ${prefix.size} docs")
      assert(m.curatedVideo().collect().map(_.toString).toSet ===
        MediaArc.videoRoute(unionDf).collect().map(_.toString).toSet,
        s"video twin diverged after ${prefix.size} docs")
    }
    // replay: both clip folds are anti-join-guarded no-ops
    val audioOnce = m.curatedAudio().collect().map(_.toString).toSet
    m.update(batches.last.toDF("doc_id", "source", "text"))
    assert(m.curatedAudio().collect().map(_.toString).toSet === audioOnce)
  }

  test("retroactive clip eviction across epochs: doc 3's shared-seed " +
    "clips are kept alone, then evicted when doc 2's smaller ids land") {
    val m = new MediaArcStream.Maintainer(spark, evalDf, ftModel)
    // doc 3 first: aud/vid 6 (pid 2) and 7 (pid 3) all kept
    m.update(Seq((3L, "s", baseText)).toDF("doc_id", "source", "text"))
    assert(m.curatedAudio().collect().map(_.getAs[Long]("aud_id")).toSet
      === Set(6L, 7L))
    // doc 2's clip 4 shares pid 2 — the earlier-kept 6 must now drop
    m.update(Seq((2L, "s", baseText)).toDF("doc_id", "source", "text"))
    assert(m.curatedAudio().collect().map(_.getAs[Long]("aud_id")).toSet
      === Set(4L, 7L))
    assert(m.curatedVideo().collect().map(_.getAs[Long]("vid_id")).toSet
      === Set(4L, 7L))
  }

  test("stateDir restart resumes the clip store too") {
    val dir = java.nio.file.Files.createTempDirectory("mediaclips").toString
    val b1 = corpus.filter(_.doc_id % 2 == 0)
    val b2 = corpus.filter(_.doc_id % 2 == 1)
    val m1 = new MediaArcStream.Maintainer(spark, evalDf, ftModel, stateDir = Some(dir))
    m1.update(b1.toDF("doc_id", "source", "text"), epochId = 0L)
    val m2 = new MediaArcStream.Maintainer(spark, evalDf, ftModel, stateDir = Some(dir))
    m2.update(b2.toDF("doc_id", "source", "text"), epochId = 1L)
    val unionDf = (b1 ++ b2).toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"), col("text"))
    assert(m2.curatedAudio().collect().map(_.toString).toSet ===
      MediaArc.audioRoute(unionDf).collect().map(_.toString).toSet)
    assert(m2.curatedVideo().collect().map(_.toString).toSet ===
      MediaArc.videoRoute(unionDf).collect().map(_.toString).toSet)
  }

  test("cross-store skew heals: a crash before the clips store's first " +
    "save (images ahead, clips empty) re-folds into agreement on replay") {
    val dir = java.nio.file.Files.createTempDirectory("mediaskew").toString
    val b1 = corpus.take(40)
    val b2 = corpus.slice(40, 80)
    val m1 = new MediaArcStream.Maintainer(spark, evalDf, ftModel, stateDir = Some(dir))
    m1.update(b1.toDF("doc_id", "source", "text"), epochId = 0L)
    // simulate the mid-update crash: text+image stores committed epoch 0,
    // the clips store never saved
    def rmrf(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rmrf(_))
      java.nio.file.Files.deleteIfExists(p)
    }
    rmrf(java.nio.file.Paths.get(dir, "clips"))
    // restart + replay epoch 0: image folds no-op on their guards, the
    // clips fold runs fresh — the stores re-converge
    val m2 = new MediaArcStream.Maintainer(spark, evalDf, ftModel, stateDir = Some(dir))
    m2.update(b1.toDF("doc_id", "source", "text"), epochId = 0L)
    m2.update(b2.toDF("doc_id", "source", "text"), epochId = 1L)
    val unionDf = (b1 ++ b2).toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"), col("text"))
    assert(m2.curatedAudio().collect().map(_.toString).toSet ===
      MediaArc.audioRoute(unionDf).collect().map(_.toString).toSet)
    assert(m2.curatedVideo().collect().map(_.toString).toSet ===
      MediaArc.videoRoute(unionDf).collect().map(_.toString).toSet)
    assert(streamView(m2) === batchTwin(b1 ++ b2))
  }

  test("volatile maintainer with a checkpoint is refused") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val m = new MediaArcStream.Maintainer(spark, evalDf, ftModel)
    val e = intercept[IllegalArgumentException] {
      MediaArcStream.start(input.toDS(), m, checkpoint = Some("/tmp/mediaarc-ckpt"))
    }
    assert(e.getMessage.contains("memory-only"))
  }
}
