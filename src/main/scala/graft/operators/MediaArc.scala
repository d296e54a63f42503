package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The MULTIMODAL web-corpus arc (x150) — image payloads through the
  * composed pipeline, the round-14 verdict's top item: a real crawl's
  * WARC files interleave HTML with the images those pages embed, and a
  * multimodal training set is (image, curated-text) PAIRS, not two
  * independent corpora. One mixed container
  * ([[graft.functions.BuildMediaWarc]]) is walked by modality route:
  *
  *   text/html  → the FULL text arc, stages 4–10 shared VERBATIM with
  *                [[WebArc]] ([[WebArc.stagesFromPages]] +
  *                [[WebArc.curatedFromStages]] — Gopher+langID screens,
  *                exact dedup, MinHash near-dup, decontamination, model
  *                screen, calibrated keep, per-source cap);
  *   image/…    → decode gate ([[graft.functions.DecodeMediaMeta]] —
  *                the planted corrupt payloads die HERE, not in the
  *                container walk) → 8×8 aHash
  *                ([[graft.functions.ImageAHash]], a REAL pixel decode)
  *                → banded Hamming near-dup ([[Dedup.hammingPairs]],
  *                radius 3, pigeonhole-lossless 4×16-bit blocking;
  *                greedy keep-first: any verified pair drops the larger
  *                img_id) → per-source cap
  *                ([[Sampling.capPerGroup]] in (md5(hi_lo), img_id)
  *                order — content-derived, arrival-order-free);
  *
  * then FUSION: kept images inner-join the doc's curated page (after
  * exact dedup a doc contributes at most one page, so the join cannot
  * fan out beyond the image count) — one row per aligned
  * (image, curated text) pair, the multimodal training sample.
  *
  * Oracle strategy: the text half reuses the x146 CTE chain verbatim
  * (same records — [[BuildMediaWarc]] embeds the [[WarcFunctions]] text
  * records byte-for-byte); the image half is replayed closed-form from
  * the pixel formula (the x29/x30 argument: gray(pid,x,y) =
  * (pid·131+x·7+y·13) mod 256, cell means, exact-integer threshold), so
  * a hash match certifies the whole container-walk → decode → hash →
  * band-join → cap composition without the oracle ever seeing a byte.
  *
  * Scale shape: the container walk and both routes are map-only off the
  * scan (no exchange below the aHash — the x34 rule); each modality
  * route re-derives the walk from the scan instead of checkpointing
  * payload bytes (recompute is cheap, materializing a 100 TB crawl's
  * payloads is not — the x146 documents-scanned-twice posture); the
  * image exchanges are ids+64-bit signatures only (banded Hamming join,
  * then the bounded cap window). Corrupt payloads NULL out at the gate
  * (never a throw); Hamming banding is candidate generation only, so
  * band choice cancels out of the emitted pair set.
  *
  * Reference scope: no analog in the reference (an options ETL); this
  * composes the engine's own x29/x30/x92 media family with the x146 arc.
  */
object MediaArc {

  /** The one mixed-container record walk both routes derive from:
    * resource records with position, type, and raw payload bytes.
    */
  private def records(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    GraftFunctions.register(spark)
    docs
      .select(col("doc_id"), col("source"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        col("source"),
        posexplode(
          GraftFunctions.mediaWarcRecords(
            GraftFunctions.buildMediaWarc(col("doc_id"), col("text"))))
          .as(Seq("pos", "r")))
      .where(col("r.rec_type") === "resource")
  }

  /** text/html route → the [[WebArc]] pages shape (doc_id, source,
    * rec_idx, page_id, host, main_text). Byte-identical records to the
    * text-only container, so the downstream selection is x146's.
    */
  private[graft] def textPagesFromMedia(docs: DataFrame): DataFrame =
    records(docs)
      .where(col("r.content_type") === "text/html")
      .select(
        col("doc_id"),
        col("source"),
        (col("pos") - 1).cast("int").as("rec_idx"),
        (col("doc_id") * 4 + (col("pos") - 1)).as("page_id"),
        GraftFunctions.urlNormalize(col("r.target_uri")).getField("host").as("host"),
        GraftFunctions.htmlExtract(col("r.payload").cast("string"), lit(0.5))
          .getField("main_text").as("main_text"))

  /** image route (BMP and GIF payloads — the format alternates by
    * (doc_id+j) parity, so the planted cross-document duplicate is a
    * CROSS-FORMAT pair and the near-dup stage only catches it if the
    * raw-pixel and LZW decoders agree bit-for-bit inside the arc)
    * through the decode gate and the aHash: one row per
    * DECODABLE image — (doc_id, source, img_j, img_id, w, h, sim,
    * ahash_hi, ahash_lo). Image j of doc d sits at container position
    * 1 (warcinfo) + 1+d%3 (text records) + j, so img_j is closed-form
    * recoverable from the walk position alone; img_id = doc_id·2+img_j
    * is injective (≤ 2 images per doc). The corrupt plant (every 7th
    * doc) fails BOTH the meta gate and the hash — either alone drops it.
    */
  /** The image records as ONE walk+decode pass, payload dropped at the
    * projection: (doc_id, source, img_j, img_id, n_bytes, meta, sim) —
    * the frame the gate, the funnel's pre-gate row, and the x150 route
    * all derive from. n_bytes is the record's Content-Length as
    * MEASURED by the walk, which the x152 oracle re-derives from the
    * byte-layout closed forms (the x92/x98 "lengths cannot be faked"
    * discipline applied to media payloads, including the GIF LZW
    * code-stream size arithmetic).
    */
  private[graft] def walkedImages(docs: DataFrame): DataFrame =
    records(docs)
      .where(col("r.content_type").isin("image/bmp", "image/gif"))
      .select(
        col("doc_id"),
        col("source"),
        (col("pos") - 2 - col("doc_id") % 3).cast("int").as("img_j"),
        (col("doc_id") * 2 + (col("pos") - 2 - col("doc_id") % 3)).as("img_id"),
        col("r.content_length").cast("long").as("n_bytes"),
        GraftFunctions.decodeMediaMeta(col("r.payload")).as("meta"),
        GraftFunctions.imageAHash(col("r.payload")).as("sim"))

  /** The REAL decode gate over a walked frame: header format + sane
    * dims from DecodeMediaMeta, decodability from the hash (ImageAHash
    * returns NULL below the 8×8 grid and on any structural damage) —
    * the corruption plant dies here, map-side, before any exchange.
    */
  private[graft] def gateImages(walked: DataFrame): DataFrame =
    walked
      .where(
        col("meta.format").isin("bmp", "gif") &&
          col("meta.width") >= 8 && col("meta.height") >= 8 &&
          col("sim").isNotNull)
      .select(
        col("doc_id"), col("source"), col("img_j"), col("img_id"),
        col("n_bytes"),
        col("meta.width").as("w"), col("meta.height").as("h"),
        (col("meta.width").cast("long") * col("meta.height")).as("n_px"),
        col("sim"),
        shiftright(col("sim"), 32).bitwiseAND(lit(0xFFFFFFFFL)).as("ahash_hi"),
        col("sim").bitwiseAND(lit(0xFFFFFFFFL)).as("ahash_lo"))

  private[graft] def gatedImages(docs: DataFrame): DataFrame =
    gateImages(walkedImages(docs))

  /** Image stage 3: banded Hamming near-dup, greedy keep-first. */
  private[graft] def keptImages(gated: DataFrame): DataFrame = {
    val drops = Dedup
      .hammingPairs(
        gated.select(col("img_id"), col("sim")), maxHamming = 3, idCol = "img_id")
      .select(col("b_id").as("img_id"))
      .distinct()
    gated.join(drops, Seq("img_id"), "left_anti")
  }

  /** Image stage 4: the per-source cap in content-hash order. */
  private[graft] def capImages(kept: DataFrame, capImg: Int): DataFrame =
    Sampling.capPerGroup(
      kept,
      group = col("source"),
      key = concat_ws("_", col("ahash_hi"), col("ahash_lo")),
      tieBreak = col("img_id"),
      cap = capImg)

  /** Image stages 3–4: near-dup + per-source cap in content-hash order. */
  private[graft] def curatedImages(gated: DataFrame, capImg: Int): DataFrame =
    capImages(keptImages(gated), capImg)

  /** The MEDIA-ROUTE funnel (x152): per-stage image count, payload byte
    * mass, and pixel mass through the image half of the multimodal arc
    * — img_records (every image record the walk yields, corrupt ones
    * included: bytes are MEASURED Content-Length, pixels unknown before
    * decode and reported as 0) → decoded (the gate's survivors) →
    * image_neardup → image_capped. The byte column is the surface's
    * point: the oracle re-derives every record's Content-Length from
    * the BMP stride/padding arithmetic and the GIF header + color table
    * + LZW code-stream size closed forms (9-bit codes, a clear every
    * 253 literals, 255-byte sub-block framing), so a hash match proves
    * the walk measured real lengths — the x92/x98 discipline extended
    * to media payloads. One walk+decode pass (checkpointed small rows,
    * payloads dropped at the projection); the stage frames re-derive
    * from it map-side plus the x150 route's own exchanges.
    */
  def funnel(docs: DataFrame, capImg: Int = 10): DataFrame = {
    val walked = walkedImages(docs).localCheckpoint(true)
    val gated = gateImages(walked)
    def agg(df: DataFrame, idx: Int, name: String, px: org.apache.spark.sql.Column): DataFrame =
      df.agg(
          count(lit(1)).as("n_images"),
          coalesce(sum(col("n_bytes")), lit(0L)).as("n_bytes"),
          coalesce(sum(px), lit(0L)).as("n_px"))
        .select(
          lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
          col("n_images"), col("n_bytes"), col("n_px"))
    // mine the pair set ONCE: stages 3 and 4 read the same kept frame
    // (small rows — ids, dims, hashes — so the checkpoint is cheap)
    val kept = keptImages(gated).localCheckpoint(true)
    agg(walked, 1, "img_records", lit(0L))
      .unionByName(agg(gated, 2, "decoded", col("n_px")))
      .unionByName(agg(kept, 3, "image_neardup", col("n_px")))
      .unionByName(agg(capImages(kept, capImg), 4, "image_capped", col("n_px")))
  }

  // ----------------------------------------------------------------
  // The AUDIO route (x154/x155): the container's third modality.
  // walk → decode gate → quality screen → exact-fingerprint dedup →
  // per-source cap, every stage map-only or exchanging ids+integer
  // stats (never payload bytes) — the image route's scale posture with
  // audio's own screen semantics (silence + too-short, the Gopher
  // analog for clips).
  // ----------------------------------------------------------------

  /** The audio records as ONE walk+decode pass, payload dropped at the
    * projection: (doc_id, source, aud_j, aud_id, n_bytes, f) — f is
    * [[graft.functions.AudioPcmFeatures]]' REAL sample fold (NULL on
    * the corruption plant). Clip j of doc d sits at container position
    * 1 (warcinfo) + 1+d%3 (text) + 1+d%2 (images) + j, so aud_j is
    * closed-form recoverable from the walk position; aud_id =
    * doc_id·2+aud_j is injective (≤ 2 clips per doc). n_bytes is the
    * record's MEASURED Content-Length, which the x155 oracle re-derives
    * from the WAV layout (exactly 44 + 2n bytes) — the x92/x98
    * "lengths cannot be faked" discipline on the third modality.
    */
  private[graft] def walkedAudio(docs: DataFrame): DataFrame =
    records(docs)
      .where(col("r.content_type") === "audio/wav")
      .select(
        col("doc_id"),
        col("source"),
        (col("pos") - 3 - col("doc_id") % 3 - col("doc_id") % 2)
          .cast("int").as("aud_j"),
        (col("doc_id") * 2 +
          (col("pos") - 3 - col("doc_id") % 3 - col("doc_id") % 2))
          .as("aud_id"),
        col("r.content_length").cast("long").as("n_bytes"),
        GraftFunctions.audioPcmFeatures(col("r.payload")).as("f"))

  /** The REAL decode gate: PCM feature fold non-NULL (the corruption
    * plant dies here, map-side — AudioPcmFeatures returns NULL on any
    * structural damage, never throws). Projects the integer feature
    * frame every later stage reads; payload bytes never leave the walk.
    */
  private[graft] def gateAudio(walked: DataFrame): DataFrame =
    walked
      .where(col("f").isNotNull)
      .select(
        col("doc_id"), col("source"), col("aud_j"), col("aud_id"),
        col("n_bytes"),
        col("f.n_samples").as("n_samples"),
        col("f.sample_rate").as("sample_rate"),
        col("f.duration_ms").as("duration_ms"),
        col("f.sum_sq").as("sum_sq"),
        col("f.sum_abs").as("sum_abs"),
        col("f.peak").as("peak"),
        col("f.zero_cross").as("zero_cross"))

  private[graft] def gatedAudio(docs: DataFrame): DataFrame =
    gateAudio(walkedAudio(docs))

  /** Audio stage 3: the quality screen — the clip-corpus Gopher rules.
    * Drop too-short clips (duration_ms < 50 — sub-perceptual fragments)
    * and silence (Σs² < n·500², i.e. rms below 500 on the 16-bit scale:
    * the loud synth reads rms ≈ 1155, the silence plant ≈ 72, so the
    * threshold sits an order of magnitude from both). All-integer
    * arithmetic — Σs² ≤ n·2³⁰ and n·250000 ≤ n·2¹⁸ both fit a long —
    * so the screen oracles exactly.
    */
  private[graft] def screenAudio(gated: DataFrame): DataFrame =
    gated.where(
      col("duration_ms") >= 50 &&
        col("sum_sq") >= col("n_samples").cast("long") * 250000L)

  /** Audio stage 4: exact-fingerprint dedup, greedy keep-first. The
    * fingerprint is the full decoded-sample statistic vector
    * (n_samples, sum_sq, sum_abs, peak, zero_cross) — content-derived
    * from the REAL PCM fold, so byte-identical re-encodes collide while
    * headers/URIs play no part; the planted (2k, 2k+1) shared-seed pair
    * collides by construction and the larger aud_id drops. One shuffle
    * on the fingerprint (ids + five integers, never samples), then a
    * rank-1 window Spark plans as WindowGroupLimit (no full sort of the
    * class, the x51 contract).
    */
  private[graft] def dedupAudio(screened: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(
        col("n_samples"), col("sum_sq"), col("sum_abs"),
        col("peak"), col("zero_cross"))
      .orderBy(col("aud_id"))
    screened
      .withColumn("graft_aud_rn", row_number().over(w))
      .where(col("graft_aud_rn") === 1)
      .drop("graft_aud_rn")
  }

  /** Audio stage 5: the per-source cap in content-hash order (the
    * [[capImages]] discipline — arrival-order-free, one owner:
    * [[Sampling.capPerGroup]]).
    */
  private[graft] def capAudio(deduped: DataFrame, capAud: Int): DataFrame =
    Sampling.capPerGroup(
      deduped,
      group = col("source"),
      key = concat_ws(
        "_", col("sum_sq"), col("sum_abs"), col("peak"),
        col("zero_cross"), col("n_samples")),
      tieBreak = col("aud_id"),
      cap = capAud)

  /** The curated audio route (x154): walk → gate → screen → dedup →
    * cap, one row per kept clip with its full decoded statistic vector.
    */
  def audioRoute(docs: DataFrame, capAud: Int = 10): DataFrame =
    capAudio(dedupAudio(screenAudio(gatedAudio(docs))), capAud)
      .select(
        col("doc_id"), col("source"), col("aud_j"), col("aud_id"),
        col("n_samples"), col("sample_rate"), col("duration_ms"),
        col("sum_sq"), col("sum_abs"), col("peak"), col("zero_cross"))

  /** The AUDIO-route funnel (x155): per-stage clip count, payload BYTE
    * mass, and SAMPLE mass — aud_records (every clip the walk yields,
    * corrupt included: bytes are MEASURED Content-Length, samples
    * unknown before decode and reported 0) → decoded → screened →
    * audio_dedup → audio_capped. One walk+decode pass (checkpointed
    * small rows, payloads dropped at the projection, the x152 shape);
    * the dedup survivors are checkpointed once and read by stages 4
    * and 5 (mine the pair structure once — the x153-round discipline).
    */
  def audioFunnel(docs: DataFrame, capAud: Int = 10): DataFrame = {
    val walked = walkedAudio(docs).localCheckpoint(true)
    val gated = gateAudio(walked)
    def agg(df: DataFrame, idx: Int, name: String, smp: org.apache.spark.sql.Column): DataFrame =
      df.agg(
          count(lit(1)).as("n_audio"),
          coalesce(sum(col("n_bytes")), lit(0L)).as("n_bytes"),
          coalesce(sum(smp), lit(0L)).as("n_samples"))
        .select(
          lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
          col("n_audio"), col("n_bytes"), col("n_samples"))
    val deduped = dedupAudio(screenAudio(gated)).localCheckpoint(true)
    val smp = col("n_samples").cast("long")
    agg(walked, 1, "aud_records", lit(0L))
      .unionByName(agg(gated, 2, "decoded", smp))
      .unionByName(agg(screenAudio(gated), 3, "screened", smp))
      .unionByName(agg(deduped, 4, "audio_dedup", smp))
      .unionByName(agg(capAudio(deduped, capAud), 5, "audio_capped", smp))
  }

  // ----------------------------------------------------------------
  // The VIDEO route (x156/x157): the container's fourth modality.
  // walk → decode gate (frame-SAMPLED checksums, the video-pipeline
  // "sample every k-th frame" verb) → too-few-frames screen →
  // signature dedup on the sampled-checksum sequence → per-source cap.
  // Payload bytes never leave the walk; the only exchanged video
  // "content" is the checksum-sequence string.
  // ----------------------------------------------------------------

  /** The video records as ONE walk+decode pass, payload dropped at the
    * projection: (doc_id, source, vid_j, vid_id, n_bytes, checks) —
    * checks is [[graft.functions.AviFrameChecksums]]' REAL movi-walk
    * at stride 2 (NULL on the corruption plant; sampling at decode time
    * is the point — a 100 TB video corpus never decodes every frame).
    * Video j of doc d sits at container position 1 (warcinfo) + 1+d%3
    * (text) + 1+d%2 (images) + 1+d%2 (audio) + j; vid_id =
    * doc_id·2+vid_j is injective (≤ 2 videos per doc). n_bytes is the
    * record's MEASURED Content-Length, which the oracles re-derive from
    * the AVI 224 + 32·frames closed form.
    */
  private[graft] def walkedVideo(docs: DataFrame): DataFrame =
    records(docs)
      .where(col("r.content_type") === "video/avi")
      .select(
        col("doc_id"),
        col("source"),
        (col("pos") - 4 - col("doc_id") % 3 - (col("doc_id") % 2) * 2)
          .cast("int").as("vid_j"),
        (col("doc_id") * 2 +
          (col("pos") - 4 - col("doc_id") % 3 - (col("doc_id") % 2) * 2))
          .as("vid_id"),
        col("r.content_length").cast("long").as("n_bytes"),
        GraftFunctions.aviFrameChecksums(col("r.payload"), lit(2)).as("checks"))

  /** The decode gate + signature projection: checksum walk non-NULL
    * (the corruption plant dies here, map-side), sampled count measured
    * from the array, and the video SIGNATURE — the sampled checksums
    * joined in frame order — computed once for the dedup and cap
    * stages. All downstream exchanges carry (ids, one int, one string).
    */
  private[graft] def gateVideo(walked: DataFrame): DataFrame =
    walked
      .where(col("checks").isNotNull)
      .select(
        col("doc_id"), col("source"), col("vid_j"), col("vid_id"),
        col("n_bytes"),
        size(col("checks")).as("n_sampled"),
        array_join(col("checks"), "_").as("sig"))

  private[graft] def gatedVideo(docs: DataFrame): DataFrame =
    gateVideo(walkedVideo(docs))

  /** Video stage 3: the too-few-frames screen — a single sampled frame
    * (frames ≤ 2 at stride 2) is a still, not a clip; a frame-sequence
    * signature over one element carries no sequence evidence.
    */
  private[graft] def screenVideo(gated: DataFrame): DataFrame =
    gated.where(col("n_sampled") >= 2)

  /** Video stage 4: signature dedup, greedy keep-first — two videos
    * whose SAMPLED frame checksums agree pairwise in order are the same
    * clip (the planted (2k, 2k+1) shared-seed pair collides by
    * construction); the smaller vid_id survives. One shuffle on the
    * signature string, rank-1 window (WindowGroupLimit-planned).
    */
  private[graft] def dedupVideo(screened: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("sig")).orderBy(col("vid_id"))
    screened
      .withColumn("graft_vid_rn", row_number().over(w))
      .where(col("graft_vid_rn") === 1)
      .drop("graft_vid_rn")
  }

  /** Video stage 5: the per-source cap in content-hash order. */
  private[graft] def capVideo(deduped: DataFrame, capVid: Int): DataFrame =
    Sampling.capPerGroup(
      deduped,
      group = col("source"),
      key = col("sig"),
      tieBreak = col("vid_id"),
      cap = capVid)

  /** The curated video route (x156): walk → gate → screen → dedup →
    * cap, one row per kept clip with its sampled-frame signature.
    */
  def videoRoute(docs: DataFrame, capVid: Int = 10): DataFrame =
    capVideo(dedupVideo(screenVideo(gatedVideo(docs))), capVid)
      .select(
        col("doc_id"), col("source"), col("vid_j"), col("vid_id"),
        col("n_bytes"), col("n_sampled"), col("sig"))

  /** The VIDEO-route funnel (x157): per-stage clip count, payload BYTE
    * mass, and SAMPLED-FRAME mass — vid_records → decoded → screened →
    * video_dedup → video_capped (the x152/x155 discipline on the fourth
    * modality; byte mass re-derived by the oracle from 224 + 32·frames).
    */
  def videoFunnel(docs: DataFrame, capVid: Int = 10): DataFrame = {
    val walked = walkedVideo(docs).localCheckpoint(true)
    val gated = gateVideo(walked)
    def agg(df: DataFrame, idx: Int, name: String, smp: org.apache.spark.sql.Column): DataFrame =
      df.agg(
          count(lit(1)).as("n_videos"),
          coalesce(sum(col("n_bytes")), lit(0L)).as("n_bytes"),
          coalesce(sum(smp), lit(0L)).as("n_sampled"))
        .select(
          lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
          col("n_videos"), col("n_bytes"), col("n_sampled"))
    val deduped = dedupVideo(screenVideo(gated)).localCheckpoint(true)
    val smp = col("n_sampled").cast("long")
    agg(walked, 1, "vid_records", lit(0L))
      .unionByName(agg(gated, 2, "decoded", smp))
      .unionByName(agg(screenVideo(gated), 3, "screened", smp))
      .unionByName(agg(deduped, 4, "video_dedup", smp))
      .unionByName(agg(capVideo(deduped, capVid), 5, "video_capped", smp))
  }

  /** Run the multimodal arc: one aligned (image, curated text) pair per
    * kept image of a doc whose page survived the full text arc.
    *
    * @return (source, doc_id, page_id, lang_pred, n_tokens, img_id,
    *         img_j, w, h, ahash_hi, ahash_lo)
    */
  def pipeline(
      docs: DataFrame,
      evalDocs: DataFrame,
      model: LinearModel.HashedLinearModel,
      capText: Int = 10,
      capImg: Int = 10,
      minIsoPpm: Long = 500000L,
      trainDim: Int = 512,
      trainRounds: Int = 3
  ): DataFrame = {
    val spark = docs.sparkSession
    // text route first: its eager checkpoints decide the short-circuit
    // before any image work is planned
    val st = WebArc.stagesFromPages(textPagesFromMedia(docs), evalDocs, model)
    if (st.screened.isEmpty) return emptyPairsOutput(spark)
    val curatedText = WebArc
      .curatedFromStages(st, capText, minIsoPpm, trainDim, trainRounds)
      .select(col("doc_id"), col("page_id"), col("lang_pred"), col("n_tokens"))
    fusePairs(curatedImages(gatedImages(docs), capImg), curatedText)
  }

  /** The fused-pair projection: curated images inner-join the doc's
    * curated page. Shared by [[pipeline]] and
    * [[graft.streaming.MediaArcStream]]'s view.
    */
  private[graft] def fusePairs(
      cappedImages: DataFrame,
      curatedText: DataFrame): DataFrame =
    cappedImages
      .join(curatedText, Seq("doc_id"))
      .select(
        col("source"), col("doc_id"), col("page_id"), col("lang_pred"),
        col("n_tokens"), col("img_id"), col("img_j"), col("w"), col("h"),
        col("ahash_hi"), col("ahash_lo"))

  /** The pair schema as an empty frame — shared by the short-circuit
    * and the stream view over an empty corpus.
    */
  private[graft] def emptyPairsOutput(
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("source", StringType), StructField("doc_id", LongType),
        StructField("page_id", LongType), StructField("lang_pred", StringType),
        StructField("n_tokens", LongType), StructField("img_id", LongType),
        StructField("img_j", IntegerType), StructField("w", IntegerType),
        StructField("h", IntegerType), StructField("ahash_hi", LongType),
        StructField("ahash_lo", LongType))))
  }
}
