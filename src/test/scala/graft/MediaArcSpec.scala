package graft

import org.apache.spark.sql.functions._

import graft.operators.{LinearModel, MediaArc}

/** x150 — the multimodal web-corpus arc. The media codec internals are
  * pinned by their own specs (MediaSpec, WarcSpec, DedupSpec); this
  * suite pins the COMPOSITION: modality routing off one container walk,
  * the decode gate actually dropping the corruption plant, the
  * cross-document image near-dup, the fusion join's no-fan-out
  * property, and the map-only plan posture of the decode route.
  */
class MediaArcSpec extends SparkSpec {
  import spark.implicits._

  private val keepAll = LinearModel.HashedLinearModel(
    8, Array(Array.fill(8)(0L), Array.fill(8)(1L)))

  private val baseText =
    "the quick brown fox jumps over lazy dogs and runs into the old barn " +
      "near town while birds sing songs about summer rain that falls onto " +
      "green fields during long quiet evenings"

  private def docsDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text").withColumn("source", lit("s"))
      .select(col("doc_id"), col("source"), col("text"))

  test("modality routing: one container walk yields the text pages AND " +
    "the images, with closed-form identities") {
    val docs = docsDf((2L, baseText), (3L, baseText + " extra words here"))
    val pages = MediaArc.textPagesFromMedia(docs).collect()
    // doc 2: 1+2%3=3 text records; doc 3: 1+3%3=1 text record
    assert(pages.length === 4)
    assert(pages.map(_.getAs[Long]("page_id")).sorted.toSeq ===
      Seq(8L, 9L, 10L, 12L))
    val imgs = MediaArc.gatedImages(docs).collect()
    // doc 2: 1+2%2=1 image (img_id 4); doc 3: 2 images (img_id 6, 7)
    assert(imgs.map(_.getAs[Long]("img_id")).sorted.toSeq === Seq(4L, 6L, 7L))
    assert(imgs.map(_.getAs[Int]("img_j")).sorted.toSeq === Seq(0, 0, 1))
    // dims follow the pid formula: pid = (doc/2)*2 + j
    val byId = imgs.map(r => r.getAs[Long]("img_id") ->
      ((r.getAs[Int]("w"), r.getAs[Int]("h")))).toMap
    assert(byId(4L) === ((16 + 2 % 16, 16 + 2 % 12))) // pid 2
    assert(byId(6L) === ((16 + 2 % 16, 16 + 2 % 12))) // pid 2 (shared!)
    assert(byId(7L) === ((16 + 3 % 16, 16 + 3 % 12))) // pid 3
    // the format alternates by (doc_id+j) parity — the shared-pixel pair
    // (img 4, img 6) is deliberately CROSS-FORMAT (BMP vs GIF), and the
    // identical hashes downstream prove both decoders agree in the arc
    val cts = docs
      .select(
        col("doc_id"),
        explode(graft.functions.GraftFunctions.mediaWarcRecords(
          graft.functions.GraftFunctions.buildMediaWarc(col("doc_id"), col("text"))))
          .as("r"))
      .where(col("r.content_type").startsWith("image/"))
      .select(col("doc_id"), col("r.content_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(cts.sorted.toSeq === Seq(
      (2L, "image/bmp"), (3L, "image/gif"), (3L, "image/bmp")).sorted)
    val byIdHash = imgs.map(r => r.getAs[Long]("img_id") -> r.getAs[Long]("sim")).toMap
    assert(byIdHash(4L) === byIdHash(6L),
      "the BMP and the GIF of the same pixels must hash identically")
  }

  test("the decode gate drops the corruption plant (doc_id % 7 == 0), " +
    "and only the gate — the container walk still yields the records") {
    val docs = docsDf((7L, baseText), (8L, baseText))
    val imgs = MediaArc.gatedImages(docs).collect()
    // doc 7's images (corrupt magic) die at the gate; doc 8's survive
    assert(imgs.map(_.getAs[Long]("doc_id")).distinct.toSeq === Seq(8L))
    // the walk itself still returned doc 7's image records (damage is
    // payload-level, not container-level)
    val walked = docs
      .select(
        col("doc_id"),
        explode(graft.functions.GraftFunctions.mediaWarcRecords(
          graft.functions.GraftFunctions.buildMediaWarc(col("doc_id"), col("text"))))
          .as("r"))
      .where(col("r.content_type").startsWith("image/"))
      .groupBy(col("doc_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(walked(7L) === 2L && walked(8L) === 1L)
  }

  test("cross-document image near-dup: docs 2k and 2k+1 share their " +
    "first image's pixels, greedy keep-first drops the larger img_id") {
    val docs = docsDf((2L, baseText), (3L, baseText))
    val kept = MediaArc
      .curatedImages(MediaArc.gatedImages(docs), capImg = 10)
      .collect()
      .map(_.getAs[Long]("img_id")).sorted.toSeq
    // gated ids: 4 (doc 2, pid 2), 6 (doc 3, pid 2 — identical), 7
    // (doc 3, pid 3). Hamming(4, 6) = 0 → 6 drops; 7 survives unless it
    // collides with pid 2's hash within radius 3 (it may — verify the
    // keep-first invariant instead of a fixed set): 4 always survives,
    // 6 never does.
    assert(kept.contains(4L))
    assert(!kept.contains(6L))
  }

  test("registered x150 on the real corpus: non-empty, deterministic, " +
    "pairs only docs the text arc kept, no join fan-out") {
    val q = SparkEntry.queries("x150_multimodal_arc")
    val a = q(spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty)
    // fusion = inner join on doc_id against the x146 selection
    val arcDocs = SparkEntry.queries("x146_web_arc")(spark, "/root/testdata/sf0.001")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(a.map(_.getAs[Long]("doc_id")).forall(arcDocs))
    // no fan-out: img_id unique in the output (one curated page per doc)
    val ids = a.map(_.getAs[Long]("img_id"))
    assert(ids.distinct.length === ids.length)
    // the corruption plant never reaches the output
    assert(a.forall(_.getAs[Long]("doc_id") % 7 != 0))
    val b = q(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
      "x150 is not run-deterministic")
  }

  test("media funnel: stage names, monotone image counts, measured " +
    "Content-Lengths equal the builders' actual byte counts") {
    val docs = docsDf((2L, baseText), (3L, baseText), (7L, baseText))
    val f = MediaArc.funnel(docs).orderBy("stage_idx").collect()
    assert(f.map(_.getString(1)).toSeq === Seq(
      "img_records", "decoded", "image_neardup", "image_capped"))
    val counts = f.map(_.getLong(2))
    // doc 2: 1 image, doc 3: 2, doc 7: 2 (corrupt) → 5 walked, 3 decoded
    assert(counts(0) === 5L && counts(1) === 3L)
    assert(counts(1) >= counts(2) && counts(2) >= counts(3))
    // pixels are unknowable before decode — stage 1 reports 0
    assert(f(0).getLong(4) === 0L && f(1).getLong(4) > 0L)
    // the byte mass at stage 1 is the MEASURED Content-Lengths of all 5
    // records — equal to the builders' actual byte counts
    import graft.functions.MediaWarcFunctions
    val expectBytes = Seq(2L, 3L, 7L).flatMap { id =>
      (0 until MediaWarcFunctions.imageCount(id)).map(j =>
        MediaWarcFunctions.imageBytes(id, j).length.toLong)
    }.sum
    assert(f(0).getLong(3) === expectBytes)
  }

  test("registered x152 reconciles with registered x150: the fused pair " +
    "set is a subset of the capped image set") {
    val funnel = SparkEntry.queries("x152_media_funnel")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val fused = SparkEntry.queries("x150_multimodal_arc")(spark, "/root/testdata/sf0.001")
      .count()
    assert(funnel("image_capped") >= fused,
      s"fusion (inner join) cannot exceed the capped set: $funnel vs $fused")
    assert(funnel("img_records") > funnel("decoded"),
      "the corruption plant must be visible at the decode stage")
  }

  test("registered x158 census: the modality spans TILE the container — " +
    "their sum equals the measured file-byte total, per-kind payload " +
    "is bounded by its span mass, and all five kinds are present") {
    val rows = SparkEntry.queries("x158_container_census")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet === Set("container", "warcinfo", "page", "image", "audio", "video"))
    val kinds = Seq("warcinfo", "page", "image", "audio", "video")
    assert(kinds.map(rows(_)._3).sum === rows("container")._3,
      "record spans must tile the container byte-for-byte")
    kinds.foreach(k => assert(rows(k)._2 < rows(k)._3,
      s"$k payload mass must be strictly under its span mass (headers exist)"))
    // every doc contributes 1 warcinfo, 1+id%3 pages, and 1+id%2 of each clip kind
    assert(rows("image")._1 === rows("audio")._1)
    assert(rows("audio")._1 === rows("video")._1)
  }

  test("plan posture: the decode route is map-only — one round-robin " +
    "exchange off the scan, nothing between it and the aHash") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val p = MediaArc.gatedImages(docs).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges === 1, s"decode route grew exchanges:\n$p")
    assert(p.contains("roundrobin") || p.contains("RoundRobin"),
      s"the one exchange must be the scan spread:\n$p")
  }
}
