package graft

import org.apache.spark.sql.functions._

import graft.operators.{LinearModel, WebArc}

/** x146 — the composed web-corpus arc. Stage internals are pinned by the
  * stage specs (WarcSpec, HtmlSpec, QualityFilterSpec, DedupSpec,
  * DecontaminateSpec, LinearModelSpec, CalibrationSpec, PackSpec); this
  * suite pins the COMPOSITION: cross-stage semantics the individual
  * specs cannot see (a dedup that fires on the extracted text, a
  * decontamination hit that removes a page the screens kept), the
  * lineage-cut plan posture, and determinism end to end.
  */
class WebArcSpec extends SparkSpec {
  import spark.implicits._

  /** An always-keep binary model (dot1 = n_feats > 0 = dot0) so stage
    * tests can isolate dedup/decontamination from the screen verdict.
    */
  private val keepAll = LinearModel.HashedLinearModel(
    8, Array(Array.fill(8)(0L), Array.fill(8)(1L)))

  // ~32 tokens, mean length in [3.0, 5.2], ≥2 distinct en stopwords,
  // en-marker argmax — passes every structural screen after decoration
  private val baseText =
    "the quick brown fox jumps over lazy dogs and runs into the old barn " +
      "near town while birds sing songs about summer rain that falls onto " +
      "green fields during long quiet evenings"
  private val otherText =
    "the small grey cat sits under our wooden table and waits for warm milk " +
      "while rain taps gently onto the window glass during late autumn nights " +
      "as lamps glow softly inside the calm house"

  private def docsDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text").withColumn("source", lit("s"))
      .select(col("doc_id"), col("source"), col("text"))

  private def arc(
      docs: org.apache.spark.sql.DataFrame,
      eval: Seq[String] = Seq.empty): org.apache.spark.sql.DataFrame =
    WebArc.pipeline(
      docs,
      evalDocs = (if (eval.isEmpty) Seq("zzz unused gram") else eval).toDF("text"),
      model = keepAll,
      minIsoPpm = 0L)

  test("multi-URI fan collapses: only rec 0 of each doc survives exact dedup") {
    // BuildWarc's 1 + id % 3 resource records share one payload, so the
    // md5(main_text) class is exactly the doc's record fan and min
    // page_id is rec 0 — the composition's first cross-stage guarantee
    val out = arc(docsDf((2L, baseText), (101L, otherText))).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("rec_idx") == 0),
      s"non-zero rec_idx survived: ${out.mkString(";")}")
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(2L, 101L))
    assert(out.forall(_.getAs[String]("host") == "example.com"))
    assert(out.forall(_.getAs[String]("lang_pred") == "en"))
  }

  test("near-dup stage fires on the EXTRACTED text: identical raw docs " +
    "(distinct pages after id decoration) collapse to the smaller page") {
    // docs 2 and 6 share raw text; their main_texts differ only in the
    // planted id decorations (j ≈ 0.7 over 3-shingles) — exact dedup
    // cannot collapse them, the MinHash stage must
    val out = arc(docsDf((2L, baseText), (6L, baseText), (101L, otherText)))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out === Set(2L, 101L), s"expected near-dup 6 dropped, got $out")
  }

  test("decontamination removes a page whose extracted text overlaps the " +
    "eval universe, after every structural screen kept it") {
    val out = arc(
      docsDf((2L, baseText), (101L, otherText)),
      eval = Seq(otherText))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out === Set(2L), s"expected contaminated 101 dropped, got $out")
  }

  test("model screen gates the arc: a never-keep model empties it") {
    val dropAll = LinearModel.HashedLinearModel(
      8, Array(Array.fill(8)(1L), Array.fill(8)(0L)))
    val out = WebArc.pipeline(
      docsDf((2L, baseText), (101L, otherText)),
      evalDocs = Seq("zzz unused gram").toDF("text"),
      model = dropAll, minIsoPpm = 0L)
    assert(out.count() === 0L)
  }

  test("registered x146 on the real corpus: non-empty, fan-collapsed, " +
    "pack bins within capacity, deterministic") {
    val q = SparkEntry.queries("x146_web_arc")
    val a = q(spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty)
    assert(a.forall(_.getAs[Int]("rec_idx") == 0))
    // next-fit contract: a bin's fill exceeds capacity only as a
    // single-doc oversize bin — at gopher's ≤90-token gate, never
    assert(a.forall(_.getAs[Long]("bin_fill") <= 256L),
      "pack bin overflowed capacity")
    val b = q(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
      "x146 is not run-deterministic")
  }

  test("funnel: monotone stage counts, agreement with the pipeline, and " +
    "the near-dup stage's cut visible at stage 4") {
    val docs = docsDf((2L, baseText), (6L, baseText), (101L, otherText))
    val eval = Seq("zzz unused gram").toDF("text")
    val f = WebArc.funnel(docs, eval, keepAll, minIsoPpm = 0L)
      .orderBy("stage_idx").collect()
    assert(f.map(_.getString(1)).toSeq === Seq(
      "pages", "screened", "exact_dedup", "near_dup", "decontaminated",
      "model_screen", "calibrated", "capped"))
    val pages = f.map(_.getLong(2))
    assert(pages.zip(pages.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: ${pages.toSeq}")
    assert(pages(0) === 7L, "2 docs x 3 recs + 1 doc x 1 rec")
    assert(pages(2) === 3L, "exact dedup collapses each doc's record fan")
    assert(pages(3) === 2L, "the near-dup stage drops the raw-identical doc 6")
    // the funnel's terminal stage IS the pipeline's selection
    val out = WebArc.pipeline(docs, eval, keepAll, minIsoPpm = 0L).count()
    assert(pages.last === out)
    assert(f.forall(_.getLong(3) >= 0L))
  }

  test("funnel: a never-keep model reports zero pages at the calibrated " +
    "and capped stages instead of crashing the fit") {
    val dropAll = LinearModel.HashedLinearModel(
      8, Array(Array.fill(8)(1L), Array.fill(8)(0L)))
    val f = WebArc.funnel(
      docsDf((2L, baseText)), Seq("zzz").toDF("text"), dropAll, minIsoPpm = 0L)
      .orderBy("stage_idx").collect()
    assert(f.length === 8)
    assert(f(5).getLong(2) === 0L && f(6).getLong(2) === 0L && f(7).getLong(2) === 0L)
    assert(f(6).getLong(3) === 0L && f(7).getLong(3) === 0L)
  }

  test("registered x149 reconciles with registered x146 on the real corpus: " +
    "terminal stage count and token mass equal the arc's selection") {
    val funnel = SparkEntry.queries("x149_arc_funnel")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    val arc = SparkEntry.queries("x146_web_arc")(spark, "/root/testdata/sf0.001")
      .select(col("n_tokens")).collect().map(_.getLong(0))
    assert(funnel("capped")._1 === arc.length.toLong)
    assert(funnel("capped")._2 === arc.sum)
    // and the funnel is monotone on the real corpus too
    val order = Seq("pages", "screened", "exact_dedup", "near_dup",
      "decontaminated", "model_screen", "calibrated", "capped")
    val counts = order.map(funnel(_)._1)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, counts.toString)
  }

  test("robots funnel: the gate cuts exactly the closed-form set " +
    "(ids ending in 3, rec_idx 2) before any screen runs") {
    // doc 3: 1 text rec, id ends in 3 → fully robots-dropped;
    // doc 2: 3 recs (0,1,2) → rec 2 robots-dropped, 0 and 1 survive;
    // doc 101: 3 recs → rec 2 dropped, 0 and 1 survive
    val docs = docsDf((3L, baseText), (2L, baseText), (101L, otherText))
    val f = WebArc.robotsFunnel(
      docs, Seq("zzz unused gram").toDF("text"), keepAll, minIsoPpm = 0L)
      .orderBy("stage_idx").collect()
    assert(f.map(_.getString(1)).toSeq === Seq(
      "pages", "robots_allowed", "screened", "exact_dedup", "near_dup",
      "decontaminated", "model_screen", "calibrated", "capped"))
    assert(f(0).getLong(2) === 7L, "raw walk: 1 + 3 + 3 records")
    assert(f(1).getLong(2) === 4L, "gate keeps recs 0,1 of docs 2 and 101")
    // downstream still behaves: exact dedup collapses each doc's fan
    assert(f(3).getLong(2) === 2L)
  }

  test("robots group selection is load-bearing: a crawler resolved to " +
    "the * group (total /doc/ disallow) gets an empty corpus") {
    val docs = docsDf((2L, baseText))
    val f = WebArc.robotsFunnel(
      docs, Seq("zzz").toDF("text"), keepAll, agent = "randombot",
      minIsoPpm = 0L)
      .orderBy("stage_idx").collect()
    assert(f(0).getLong(2) === 3L, "the walk itself is ungated")
    assert(f(1).getLong(2) === 0L, "the * group disallows the whole tree")
    assert(f.last.getLong(2) === 0L)
  }

  test("registered x151 reconciles with x149 on the real corpus: the " +
    "robots gate only removes mass, and downstream stages are a subset") {
    val gated = SparkEntry.queries("x151_robots_arc")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val full = SparkEntry.queries("x149_arc_funnel")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(gated("pages") === full("pages"), "the raw walk is identical")
    assert(gated("robots_allowed") < gated("pages"), "the gate must cut")
    for (s <- Seq("screened", "exact_dedup", "near_dup", "decontaminated"))
      assert(gated(s) <= full(s), s"stage $s grew under a pure filter")
  }

  test("plan posture: the lineage cuts hold — the final plan roots at the " +
    "checkpointed RDDs, no parquet scan and no classifier re-expansion") {
    // the measured failure mode this pins: without the two localCheckpoint
    // cuts, the composed join tree duplicated the upstream arc into 8676
    // FileScan nodes and Catalyst spent ~20 s PLANNING the training jobs
    val df = SparkEntry.queries("x146_web_arc")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("FileScan parquet"),
      "a parquet scan re-entered the post-cut plan — a lineage cut was lost")
    assert(p.contains("ExistingRDD"), "checkpoint root missing from the plan")
    assert(!p.contains("FtBinaryDots"),
      "the classifier re-expanded above the screened checkpoint")
  }
}
