package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, MediaWarcFunctions}
import graft.operators.MediaArc

/** x156/x157 — the video route, the container's fourth modality. The
  * AVI walk internals are pinned by AudioVideoSpec/CodecFuzzSpec; this
  * suite pins the COMPOSITION: routing identities off the container
  * walk, each plant dying at its own stage (corruption → gate, stills →
  * screen, shared-seed duplicate → signature dedup), the x89 seed-0
  * bytes staying verbatim under the shared-core refactor, and the
  * funnel's measured byte mass against the builders' actual counts.
  */
class VideoArcSpec extends SparkSpec {
  import spark.implicits._

  private val txt = "plain fixture text for the video route"

  private def docsDf(ids: Long*) =
    ids.map(id => (id, txt)).toDF("doc_id", "text")
      .withColumn("source", lit("s"))
      .select(col("doc_id"), col("source"), col("text"))

  test("the shared AviFramesBytes core at seed 0 is BuildAviFrames' " +
    "historical byte stream — x89's fixture is refactor-invariant") {
    val viaCore = graft.functions.AviFramesBytes(12, 10, 3, seed = 0L)
    // frame f byte i must be the historical (w·31 + h·17 + f·7 + i·13) & 0xff
    assert(viaCore.length === 224 + 32 * 3)
    for (f <- 0 until 3; i <- 0 until 24) {
      val off = 224 + f * 32 + 8 + i // movi payload byte offsets
      assert((viaCore(off) & 0xff) === ((12 * 31 + 10 * 17 + f * 7 + i * 13) & 0xff),
        s"frame $f byte $i diverged from the historical closed form")
    }
  }

  test("routing identities: clip count 1 + id%2, vid_j/vid_id closed " +
    "form, measured bytes = 224 + 32·frames = builder bytes") {
    val walked = MediaArc.walkedVideo(docsDf(2L, 3L)).collect()
    // doc 2: 1 video (vid_id 4); doc 3: 2 videos (vid_id 6, 7)
    assert(walked.map(_.getAs[Long]("vid_id")).sorted.toSeq === Seq(4L, 6L, 7L))
    assert(walked.map(_.getAs[Int]("vid_j")).sorted.toSeq === Seq(0, 0, 1))
    val byId = walked.map(r =>
      r.getAs[Long]("vid_id") -> r.getAs[Long]("n_bytes")).toMap
    assert(byId(4L) === MediaWarcFunctions.videoBytes(2L, 0).length.toLong)
    assert(byId(4L) === 224L + 32L * (2L + 2L % 9L)) // pid 2 → 4 frames
    assert(byId(7L) === 224L + 32L * (2L + 3L % 9L)) // pid 3 → 5 frames
  }

  test("sampled checksums equal the payload congruence re-folded in " +
    "plain Scala; the gate yields the in-order signature") {
    val gated = MediaArc.gatedVideo(docsDf(2L)).collect()
    assert(gated.length === 1)
    val r = gated.head
    val pid = 2L
    val (w, h, fr) = MediaWarcFunctions.videoDims(pid)
    assert(fr === 4)
    val expect = (0 until fr by 2).map { f =>
      (0 until 24).map(i =>
        ((pid * 41 + w * 31 + h * 17 + f * 7 + i * 13) % 256) * (i + 1)).sum
    }
    assert(r.getAs[Int]("n_sampled") === 2)
    assert(r.getAs[String]("sig") === expect.mkString("_"))
  }

  test("the corruption plant (doc_id % 7 == 0) dies at the decode gate; " +
    "the walk still yields the records") {
    val docs = docsDf(7L, 8L)
    assert(MediaArc.walkedVideo(docs).count() === 3)
    val gated = MediaArc.gatedVideo(docs).collect()
    assert(gated.map(_.getAs[Long]("doc_id")).distinct.toSeq === Seq(8L))
  }

  test("the stills plant (pid % 9 == 0 → 2 frames → 1 sampled) dies at " +
    "the too-few-frames screen; its sibling survives") {
    // doc 9: clips pid 8 (fr=10 → 5 sampled) and pid 9 (fr=2 → 1 sampled)
    val gated = MediaArc.gatedVideo(docsDf(9L))
    assert(gated.count() === 2)
    val kept = MediaArc.screenVideo(gated).collect()
    assert(kept.map(_.getAs[Long]("vid_id")).toSeq === Seq(18L))
    assert(kept.head.getAs[Int]("n_sampled") === 5)
  }

  test("cross-document video dedup: docs 2k and 2k+1 share their first " +
    "clip's frames, greedy keep-first drops the larger vid_id") {
    val screened = MediaArc.screenVideo(MediaArc.gatedVideo(docsDf(2L, 3L)))
    assert(screened.count() === 3) // vid 4 (pid 2), 6 (pid 2), 7 (pid 3)
    val kept = MediaArc.dedupVideo(screened).collect()
      .map(_.getAs[Long]("vid_id")).sorted.toSeq
    assert(kept === Seq(4L, 7L))
  }

  test("video funnel: stage names, per-stage counts, measured byte mass " +
    "= builder byte counts, samples unknowable before decode") {
    val f = MediaArc.videoFunnel(docsDf(2L, 3L, 7L)).orderBy("stage_idx").collect()
    assert(f.map(_.getString(1)).toSeq === Seq(
      "vid_records", "decoded", "screened", "video_dedup", "video_capped"))
    // doc 2: 1 video, doc 3: 2, doc 7: 2 (corrupt) → 5 walked, 3 decoded,
    // 3 screened (pids 2, 2, 3 — frames 4, 4, 5), 2 after dedup
    assert(f.map(_.getLong(2)).toSeq === Seq(5L, 3L, 3L, 2L, 2L))
    assert(f(0).getLong(4) === 0L && f(1).getLong(4) > 0L)
    val expectBytes = Seq(2L, 3L, 7L).flatMap { id =>
      (0 until MediaWarcFunctions.videoCount(id)).map(j =>
        MediaWarcFunctions.videoBytes(id, j).length.toLong)
    }.sum
    assert(f(0).getLong(3) === expectBytes)
  }

  test("registered x156 on the real corpus: non-empty, deterministic, " +
    "no plant reaches the output, reconciles with the x157 funnel") {
    val q = SparkEntry.queries("x156_video_route")
    val a = q(spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty)
    assert(a.forall(_.getAs[Long]("doc_id") % 7 != 0), "corruption plant leaked")
    assert(a.forall(_.getAs[Int]("n_sampled") >= 2), "stills plant leaked")
    val sigs = a.map(_.getAs[String]("sig"))
    assert(sigs.distinct.length === sigs.length, "duplicate signature leaked")
    val b = q(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
      "x156 is not run-deterministic")
    val funnel = SparkEntry.queries("x157_video_funnel")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(funnel("video_capped") === a.length.toLong)
  }
}
