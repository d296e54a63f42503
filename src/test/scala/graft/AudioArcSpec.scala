package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, MediaWarcFunctions}
import graft.operators.MediaArc

/** x154/x155 — the audio route, the container's third modality. The WAV
  * codec internals are pinned by AudioVideoSpec/CodecFuzzSpec; this
  * suite pins the COMPOSITION: closed-form routing identities off the
  * container walk, each of the four plants dying at exactly its own
  * stage (corruption → gate, too-short → duration screen, silence →
  * energy screen, shared-seed duplicate → dedup), the funnel's measured
  * byte mass against the builders' actual byte counts, and the
  * registered surface's determinism on the real corpus.
  */
class AudioArcSpec extends SparkSpec {
  import spark.implicits._

  private val txt = "plain fixture text for the audio route"

  private def docsDf(ids: Long*) =
    ids.map(id => (id, txt)).toDF("doc_id", "text")
      .withColumn("source", lit("s"))
      .select(col("doc_id"), col("source"), col("text"))

  test("routing identities: clip count 1 + id%2, aud_j/aud_id closed " +
    "form from the walk position, measured bytes = builder bytes") {
    val walked = MediaArc.walkedAudio(docsDf(2L, 3L)).collect()
    // doc 2: 1 clip (aud_id 4); doc 3: 2 clips (aud_id 6, 7)
    assert(walked.map(_.getAs[Long]("aud_id")).sorted.toSeq === Seq(4L, 6L, 7L))
    assert(walked.map(_.getAs[Int]("aud_j")).sorted.toSeq === Seq(0, 0, 1))
    val byId = walked.map(r =>
      r.getAs[Long]("aud_id") -> r.getAs[Long]("n_bytes")).toMap
    assert(byId(4L) === MediaWarcFunctions.audioBytes(2L, 0).length.toLong)
    assert(byId(7L) === MediaWarcFunctions.audioBytes(3L, 1).length.toLong)
    // WAV layout: exactly 44 + 2n bytes, n = 300 + pid%7*100
    assert(byId(4L) === 44L + 2L * 500L) // pid 2
    assert(byId(7L) === 44L + 2L * 600L) // pid 3
  }

  test("decoded features equal the congruence closed form re-folded in " +
    "plain Scala — two derivations of one integer answer") {
    val gated = MediaArc.gatedAudio(docsDf(2L)).collect()
    assert(gated.length === 1)
    val r = gated.head
    val pid = 2L
    val n = 500
    val samples = (0 until n).map(i =>
      (java.lang.Math.floorMod(pid * 7919 + i * 2657L, 4001L) - 2000L).toInt)
    assert(r.getAs[Int]("n_samples") === n)
    assert(r.getAs[Int]("sample_rate") === 8000)
    assert(r.getAs[Long]("duration_ms") === n.toLong * 1000L / 8000L)
    assert(r.getAs[Long]("sum_sq") === samples.map(s => s.toLong * s).sum)
    assert(r.getAs[Long]("sum_abs") === samples.map(s => math.abs(s).toLong).sum)
    assert(r.getAs[Int]("peak") === samples.map(math.abs).max)
    assert(r.getAs[Int]("zero_cross") ===
      samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
  }

  test("the corruption plant (doc_id % 7 == 0) dies at the decode gate " +
    "and only the gate — the walk still yields the records") {
    val docs = docsDf(7L, 8L)
    val walked = MediaArc.walkedAudio(docs).collect()
    // doc 7: 2 clips, doc 8: 1 clip — all three walk
    assert(walked.length === 3)
    val gated = MediaArc.gatedAudio(docs).collect()
    assert(gated.map(_.getAs[Long]("doc_id")).distinct.toSeq === Seq(8L))
  }

  test("the too-short plant (pid % 7 == 0, 37 ms) dies at the duration " +
    "screen; its 50 ms sibling survives") {
    // doc 1: clips pid 0 (n=300 → 37 ms, loud) and pid 1 (n=400 → 50 ms)
    val gated = MediaArc.gatedAudio(docsDf(1L))
    assert(gated.count() === 2)
    val kept = MediaArc.screenAudio(gated).collect()
    assert(kept.map(_.getAs[Long]("aud_id")).toSeq === Seq(3L))
    assert(kept.head.getAs[Long]("duration_ms") === 50L)
  }

  test("the silence plant (pid % 5 == 4, rms ≈ 72) dies at the energy " +
    "screen while its loud sibling survives — headers are identical, " +
    "only a real sample fold can tell them apart") {
    // doc 5: clips pid 4 (quiet) and pid 5 (loud), both long enough
    val gated = MediaArc.gatedAudio(docsDf(5L)).collect()
    assert(gated.length === 2)
    val quiet = gated.find(_.getAs[Long]("aud_id") === 10L).get
    assert(quiet.getAs[Int]("peak") <= 125,
      "the silence plant's samples must sit in the mod-251 band")
    val kept = MediaArc.screenAudio(MediaArc.gatedAudio(docsDf(5L))).collect()
    assert(kept.map(_.getAs[Long]("aud_id")).toSeq === Seq(11L))
  }

  test("cross-document audio dedup: docs 2k and 2k+1 share their first " +
    "clip's samples, greedy keep-first drops the larger aud_id") {
    val screened = MediaArc.screenAudio(MediaArc.gatedAudio(docsDf(2L, 3L)))
    assert(screened.count() === 3) // aud 4 (pid 2), 6 (pid 2), 7 (pid 3)
    val kept = MediaArc.dedupAudio(screened).collect()
      .map(_.getAs[Long]("aud_id")).sorted.toSeq
    assert(kept === Seq(4L, 7L))
  }

  test("audio funnel: stage names, monotone counts, measured byte mass " +
    "= builder byte counts, samples unknowable before decode") {
    val f = MediaArc.audioFunnel(docsDf(2L, 3L, 7L)).orderBy("stage_idx").collect()
    assert(f.map(_.getString(1)).toSeq === Seq(
      "aud_records", "decoded", "screened", "audio_dedup", "audio_capped"))
    val counts = f.map(_.getLong(2))
    // doc 2: 1 clip, doc 3: 2, doc 7: 2 (corrupt) → 5 walked, 3 decoded,
    // 3 screened (pids 2, 2, 3 — none short or quiet), 2 after dedup
    assert(counts.toSeq === Seq(5L, 3L, 3L, 2L, 2L))
    assert(f(0).getLong(4) === 0L && f(1).getLong(4) > 0L)
    val expectBytes = Seq(2L, 3L, 7L).flatMap { id =>
      (0 until MediaWarcFunctions.audioCount(id)).map(j =>
        MediaWarcFunctions.audioBytes(id, j).length.toLong)
    }.sum
    assert(f(0).getLong(3) === expectBytes)
  }

  test("registered x154 on the real corpus: non-empty, deterministic, " +
    "no plant reaches the output, reconciles with the x155 funnel") {
    val q = SparkEntry.queries("x154_audio_route")
    val a = q(spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty)
    assert(a.forall(_.getAs[Long]("doc_id") % 7 != 0), "corruption plant leaked")
    assert(a.forall(_.getAs[Long]("duration_ms") >= 50L), "short plant leaked")
    assert(a.forall(r => r.getAs[Long]("sum_sq") >=
      r.getAs[Int]("n_samples").toLong * 250000L), "silence plant leaked")
    val fps = a.map(r => (r.getAs[Int]("n_samples"), r.getAs[Long]("sum_sq"),
      r.getAs[Long]("sum_abs"), r.getAs[Int]("peak"), r.getAs[Int]("zero_cross")))
    assert(fps.distinct.length === fps.length, "duplicate fingerprint leaked")
    val b = q(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
      "x154 is not run-deterministic")
    val funnel = SparkEntry.queries("x155_audio_funnel")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(funnel("audio_capped") === a.length.toLong,
      "the funnel's last stage must equal the route's output")
  }

  test("plan posture: the audio decode route is map-only — one " +
    "round-robin exchange off the scan, nothing between it and the fold") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    GraftFunctions.register(spark)
    val p = MediaArc.gatedAudio(docs).queryExecution.executedPlan.toString
    assert(!p.contains("SortExchange") && !p.contains("hashpartitioning"),
      s"decode route must not shuffle on a key:\n$p")
  }
}
