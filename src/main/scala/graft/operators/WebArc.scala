package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The FULL web-corpus curation arc as ONE composed operator (x146) —
  * the engine's stated purpose, end to end: WARC container ingest →
  * record walk → URL normalize → HTML main-text extraction → structural
  * quality screens (Gopher cascade + language-ID) → exact dedup →
  * MinHash-LSH near-dup dedup → eval-set decontamination → learned model
  * screen → trained-scorer isotonic-calibrated keep → per-source cap →
  * next-fit sequence packing. Every stage is an existing, individually
  * oracled operator (x92, x95, x90, x58, x05, x01, x07, x21, x127,
  * x128/x142, x51, x24); this surface exists because cross-stage plan
  * pathologies — a pushdown crossing a spread exchange (the x127
  * lesson), a persist boundary dropped between a multi-consumer stage
  * and its readers — can only appear in the composition.
  *
  * Stage semantics (the oracle replays each, in this order):
  *   1. Each document becomes a multi-record WARC file (BuildWarc: 1 +
  *      doc_id % 3 resource records sharing one payload page — the
  *      "same page crawled at several URIs" shape); the record walk
  *      splits it back; page_id = doc_id·4 + rec_idx (injective: ≤ 3
  *      records per doc).
  *   2. The record's target URI is normalized (scheme/host case, dot
  *      segments, default ports — [[graft.functions.UrlNormalize]]).
  *   3. HtmlExtract recovers main_text from the payload.
  *   4. SCREEN-FIRST (the Curation equivalence argument — every screen
  *      is a pure function of main_text, and an md5 class shares
  *      main_text, so a class passes as a unit): Gopher token/mean-len/
  *      stopword cascade, then language-ID ≠ 'und'.
  *   5. Exact dedup: min page_id survives per md5(main_text) class —
  *      collapses the multi-URI fan (rec 0 survives per doc) and any
  *      cross-page exact copies.
  *   6. Near-dup: MinHash-LSH candidate pairs at the x07 operating
  *      point (3-shingles, θ = 0.5, 32 bands × 4 rows), exact-Jaccard
  *      verified; a page with a verified near-dup of SMALLER page_id is
  *      dropped (the deterministic greedy keep-first rule — no
  *      transitive closure, so a SQL engine replays it directly).
  *   7. Decontamination: pages sharing ≥ half their distinct 3-gram
  *      shingles (round-4dp contamination ≥ 0.5) with the eval set's
  *      gram universe are dropped — bloom-prefiltered probe, exact
  *      verify ([[Decontaminate.overlapBloom]]).
  *   8. Model screen: the planted fastText-style classifier over
  *      main_text, keep pred = class 1 (dot1 > dot0 — the x127 rule).
  *   9. Calibrated keep: an integer batch perceptron is TRAINED on the
  *      screened pages (y = underlying doc parity, the x128 plant), the
  *      pages are scored under the trained weights, rank-deciled, and
  *      kept iff their bin's ISOTONIC positive rate clears `minIsoPpm`
  *      ([[Calibration.calibratedScreen]] — x142's precision-targeted
  *      gate instead of an arbitrary raw-score cut).
  *  10. Per-source cap: ≤ `cap` pages per source in (md5(main_text),
  *      page_id) order (x51's reproducible, arrival-order-free quota).
  *  11. Packing: next-fit into `packCapacity`-token bins within
  *      `packGroups` deterministic groups (page_id mod groups — x24's
  *      oracle-replayable grouping).
  *
  * Scale shape: stages 1–4 are map-only expression work repartitioned
  * off the scan (the x34 rule); stage 5 is the first exchange (md5,
  * shrunk by the screens to the passing subset); stage 6 shuffles only
  * ids + band hashes over exact-deduped DISTINCT texts (the LSH skew
  * guard's precondition holds by construction here); stage 7 ships a
  * bloom filter, never the eval strings; stages 8–9 are map-only scoring
  * plus the constant-size calibration fit; stages 10–11 are two bounded
  * window exchanges. The documents table is scanned exactly twice (the
  * arc input and the eval set) — WebArcSpec pins both scan count and
  * the classifier's post-exchange placement.
  *
  * Reference scope: the reference pipeline (main.py) has no web arc;
  * this is the north-star LLM-data composition the round-13 verdict
  * prescribed (top item), built entirely from the engine's own stages.
  */
object WebArc {

  /** Run the full arc.
    *
    * @param docs     (doc_id, source, text) corpus rows
    * @param evalDocs eval/benchmark rows carrying `text` (raw benchmark
    *                 text; its distinct 3-gram universe is the
    *                 decontamination target)
    * @param model    the screening classifier (binary; keep = class 1)
    * @return one row per curated page: (source, doc_id, rec_idx, host,
    *         lang_pred, n_tokens, score, iso_ppm, pack_grp, pack_bin,
    *         bin_fill)
    */
  /** The arc's stage frames through the model screen — shared by
    * [[pipeline]] and [[funnel]] so the two surfaces cannot drift.
    */
  private[operators] final case class ArcStages(
      pages: DataFrame,
      screenedPages: DataFrame,
      survivors: DataFrame,
      afterNearDup: DataFrame,
      clean: DataFrame,
      screened: DataFrame)

  def pipeline(
      docs: DataFrame,
      evalDocs: DataFrame,
      model: LinearModel.HashedLinearModel,
      cap: Int = 10,
      minIsoPpm: Long = 500000L,
      trainDim: Int = 512,
      trainRounds: Int = 3,
      packCapacity: Long = 256L,
      packGroups: Int = 8
  ): DataFrame = {
    val spark = docs.sparkSession
    val st = buildStages(docs, evalDocs, model)
    // an upstream delivery the screens fully reject is an EMPTY curated
    // set, not a crash — the calibration fit (rightly) refuses an empty
    // frame, so short-circuit before it. The checkpointed `screened` is
    // already materialized; isEmpty is a first-partition peek.
    if (st.screened.isEmpty) return emptyArcOutput(spark)
    val capped = curatedFromStages(st, cap, minIsoPpm, trainDim, trainRounds)
    packCurated(capped, packCapacity, packGroups)
  }

  /** The arc's output schema as an empty frame — the short-circuit for
    * a delivery the screens fully reject (the calibration fit rightly
    * refuses an empty frame). Shared with [[graft.streaming.ArcStream]].
    */
  private[graft] def emptyArcOutput(
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("source", StringType), StructField("doc_id", LongType),
        StructField("rec_idx", IntegerType), StructField("host", StringType),
        StructField("lang_pred", StringType), StructField("n_tokens", LongType),
        StructField("score", LongType), StructField("iso_ppm", LongType),
        StructField("pack_grp", LongType), StructField("pack_bin", LongType),
        StructField("bin_fill", LongType))))
  }

  /** Stage 11 + the final projection: next-fit pack in deterministic
    * page_id-mod groups. Shared by [[pipeline]] and the stream view.
    */
  private[graft] def packCurated(
      capped: DataFrame,
      packCapacity: Long,
      packGroups: Int): DataFrame = {
    val packed = Pack
      .nextFit(
        capped.select(col("page_id"), col("n_tokens")),
        idCol = "page_id", tokensCol = "n_tokens",
        capacity = packCapacity, numGroups = packGroups,
        groupExpr = Some(pmod(col("page_id"), lit(packGroups.toLong))))
      .select(
        col("doc").as("page_id"), col("grp").as("pack_grp"),
        col("bin").as("pack_bin"), col("bin_fill"))

    capped
      .join(packed, "page_id")
      .select(
        col("source"), col("doc_id"), col("rec_idx"), col("host"),
        col("lang_pred"), col("n_tokens"), col("score"), col("iso_ppm"),
        col("pack_grp"), col("pack_bin"), col("bin_fill"))
  }

  /** Stages 9–10 over built stages: calibrated keep + per-source cap —
    * the curated page set BEFORE packing. Shared by [[pipeline]] (which
    * packs it) and the multimodal arc (which pairs it with curated
    * images). Caller must have checked `st.screened` non-empty (the
    * calibration fit refuses an empty frame).
    */
  private[operators] def curatedFromStages(
      st: ArcStages,
      cap: Int,
      minIsoPpm: Long,
      trainDim: Int,
      trainRounds: Int): DataFrame =
    curatedFromScreened(st.screened, cap, minIsoPpm, trainDim, trainRounds)

  /** Stages 9–10 from any frame in the `screened` shape (page_id,
    * doc_id, rec_idx, source, host, text_md5, lang_pred, n_tokens,
    * main_text, y) — additionally shared by [[graft.streaming.ArcStream]],
    * whose screened set is a VIEW over maintained state. Caller must
    * pass a non-empty, multi-pass-safe (checkpointed) frame.
    */
  private[graft] def curatedFromScreened(
      screened: DataFrame,
      cap: Int,
      minIsoPpm: Long,
      trainDim: Int,
      trainRounds: Int): DataFrame = {
    val calibrated = screened.drop("y")
      .join(keptPages(screened, minIsoPpm, trainDim, trainRounds), "page_id")
    capSelect(calibrated, cap)
  }

  /** Stage 9: train the quality perceptron on the screened pages, score
    * them, keep by isotonic-calibrated precision. Returns the kept
    * (page_id, score, iso_ppm) rows.
    */
  private def keptPages(
      screened: DataFrame,
      minIsoPpm: Long,
      trainDim: Int,
      trainRounds: Int): DataFrame = {
    // ONE feature-hash pass (r15): the bucket-count vectors feed both
    // the training rounds AND the trained-scorer pass — the previous
    // shape hashed every feature of every screened page twice more
    // (trainer's sparse table build + a full re-classify), and
    // hash40-per-feature is md5 work, the arc's hottest expression.
    // dot1 under weights [0… ++ w] ≡ Σ w(b)·cnt(b), so `score` is
    // bit-identical to the classify formulation (LinearModelSpec pins
    // FtBucketCounts/LongVecDotLit ≡ the Column algebra). The scored
    // frame is tiny (id, score, y) and eagerly checkpointed so the
    // calibration's two consumers never recompute the hash pass.
    val fcv = LinearModel
      .bucketCountVectors(screened, "main_text", trainDim, "page_id", col("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (w, _) = LinearModel.trainOnVectors(
      fcv, dim = trainDim, rounds = trainRounds, idCol = "page_id")
    val scored = fcv
      .select(
        col("page_id"),
        LinearModel.scoreWith(col("graft_cv"), w).as("score"),
        col("y"))
      .localCheckpoint(true)
    fcv.unpersist()
    Calibration
      .calibratedScreen(
        scored, bins = 10, minIsoPpm = minIsoPpm, idCol = "page_id")
      .where(col("kept"))
      .select(col("page_id"), col("score"), col("iso_ppm"))
  }

  /** Stage 10: the per-source cap in (md5(main_text), page_id) order —
    * [[Sampling.capPerGroup]] verbatim (the x51 surface owns the
    * WindowGroupLimit scale contract; md5(main_text) ≡ the chain's
    * text_md5, so the kept set is unchanged).
    */
  private def capSelect(calibrated: DataFrame, cap: Int): DataFrame =
    Sampling.capPerGroup(
      calibrated, group = col("source"), key = col("main_text"),
      tieBreak = col("page_id"), cap = cap)

  /** Stages 1–8 (through the model screen), shared verbatim by the
    * pipeline and the funnel.
    */
  private def buildStages(
      docs: DataFrame,
      evalDocs: DataFrame,
      model: LinearModel.HashedLinearModel,
      obs: (String, DataFrame) => DataFrame = (_, df) => df
  ): ArcStages =
    stagesFromPages(textPages(docs), evalDocs, model, obs)

  /** Stages 1–3: ingest + record walk + URL normalize + extract,
    * map-only off the scan. All records of a doc share the payload; the
    * walk is the real byte walk (x92 hash-certifies it; here it feeds
    * the arc).
    */
  /** Stage 4 as a standalone map-side step — the Gopher cascade, md5,
    * language-ID and token count over a pages frame. Shared by the
    * batch chain and [[graft.streaming.ArcStream]]'s per-batch fold
    * (the screen-first equivalence makes the split safe: every screen
    * is a pure text function).
    */
  private[graft] def screenPages(pages: DataFrame): DataFrame =
    QualityFilter
      .gopherFlags(pages, textCol = "main_text")
      .where(col("keep"))
      .select(
        col("page_id"), col("doc_id"), col("rec_idx"), col("source"),
        col("host"), col("main_text"),
        md5(col("main_text")).as("text_md5"),
        TextAnalysis.langId(TextAnalysis.tokens(col("main_text"))).as("lang_pred"),
        TextAnalysis.bpeishTokenCount(col("main_text")).cast("long").as("n_tokens"))
      .where(col("lang_pred") =!= "und")

  private[graft] def textPages(docs: DataFrame, keepPath: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    GraftFunctions.register(spark)
    val norm = GraftFunctions.urlNormalize(col("r.target_uri"))
    val cols = Seq(
      col("doc_id"),
      col("source"),
      (col("pos") - 1).cast("int").as("rec_idx"),
      (col("doc_id") * 4 + (col("pos") - 1)).as("page_id"),
      norm.getField("host").as("host"),
      GraftFunctions.htmlExtract(col("r.payload"), lit(0.5))
        .getField("main_text").as("main_text")) ++
      (if (keepPath) Seq(norm.getField("path").as("path")) else Seq.empty)
    docs
      .select(col("doc_id"), col("source"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        col("source"),
        posexplode(
          GraftFunctions.warcRecords(
            GraftFunctions.buildWarc(col("doc_id"), col("text"))))
          .as(Seq("pos", "r")))
      .where(col("r.rec_type") === "resource")
      .select(cols: _*)
  }

  /** Stages 4–8 from a pre-built pages frame (doc_id, source, rec_idx,
    * page_id, host, main_text) — the container-agnostic core shared by
    * the text arc ([[textPages]]) and the multimodal arc
    * ([[MediaArc]]'s text/html route), so one container walk can feed
    * both modalities without forking the selection logic.
    */
  private[operators] def stagesFromPages(
      pages0: DataFrame,
      evalDocs: DataFrame,
      model: LinearModel.HashedLinearModel,
      obs: (String, DataFrame) => DataFrame = (_, df) => df,
      pagesStage: String = "pages"
  ): ArcStages = {
    GraftFunctions.register(pages0.sparkSession)
    // the FUNNEL observes each stage frame in place (CollectMetrics
    // nodes riding the pipeline's own executions — audit for free, no
    // persist, no second traversal); the pipeline passes the identity.
    // `pagesStage` names this first observer — the robots variant calls
    // its post-gate frame "robots_allowed" and observes the raw walk
    // upstream under "pages".
    val pages = obs(pagesStage, pages0)

    // 4: map-side screens BEFORE the md5 exchange (screen-first
    // equivalence — see scaladoc; shrinks the first shuffle to the
    // passing subset, the Curation posture)
    val screenedPages = obs("screened", screenPages(pages))

    // 5: exact dedup — min page_id per md5 class. localCheckpoint, not
    // persist: the survivor set feeds the LSH miner, two anti-joins, the
    // scorer, and the final joins — every downstream JOIN textually
    // duplicates its subtree in the analyzed plan, so a 12-stage
    // composition with persist-only boundaries compounds to a plan
    // Catalyst spends SECONDS re-optimizing per job (measured: 8676
    // FileScan nodes in the executed-plan string; the training stage —
    // ~400 cached rows — burned 21 s in the planner). Cutting lineage at
    // the two multi-consumer hubs collapses every downstream plan to an
    // RDD-scan root (the PageRank localCheckpoint lesson applied to
    // composition).
    val survivors = obs(
      "exact_dedup",
      screenedPages
        .withColumn(
          "rn_dup",
          row_number().over(Window.partitionBy(col("text_md5")).orderBy(col("page_id"))))
        .where(col("rn_dup") === 1)
        .drop("rn_dup"))
      .localCheckpoint(true)

    // 6: near-dup drop — verified LSH pairs, greedy keep-first
    val ndDrop = Dedup
      .minhashLshPairs(
        survivors.select(col("page_id"), col("main_text")),
        n = 3, threshold = 0.5, bands = 32, rowsPerBand = 4,
        idCol = "page_id", textCol = "main_text")
      .select(col("b_id").as("page_id"))
      .distinct()
    // the bloom probe reads the RAW anti-join (afterNearDup0, not the
    // observed frame) so the near_dup CollectMetrics node appears
    // exactly once in the downstream plan — a duplicated observed node
    // would double-deliver the metric
    val afterNearDup0 = survivors.join(ndDrop, Seq("page_id"), "left_anti")
    val afterNearDup = obs("near_dup", afterNearDup0)

    // 7: decontaminate — drop contamination ≥ 0.5 vs the eval universe
    val contaminated = Decontaminate
      .overlapBloom(
        corpus = afterNearDup0.select(col("page_id"), col("main_text")),
        evalSet = evalDocs.select(col("text").as("main_text")),
        n = 3, expectedGrams = 100000L,
        idCol = "page_id", textCol = "main_text")
      .where(col("contamination") >= 0.5)
      .select(col("page_id"))
    val clean = obs(
      "decontaminated",
      afterNearDup.join(contaminated, Seq("page_id"), "left_anti"))

    // 8: model screen (planted classifier, keep class 1) + the parity
    // label the calibration trainer fits. The arc's second lineage cut:
    // feeds the trainer (multiple passes), the scoring pass, and the
    // final column join (see the survivors comment).
    val screened = obs(
      "model_screen",
      LinearModel
        .classify(clean, "main_text", model)
        .where(col("dot1") > col("dot0"))
        .select(
          col("page_id"), col("doc_id"), col("rec_idx"), col("source"),
          col("host"), col("text_md5"), col("lang_pred"), col("n_tokens"),
          col("main_text"),
          when(col("doc_id") % 2 === 0, 1L).otherwise(-1L).as("y")))
      // spread BEFORE the checkpoint: AQE coalesces the upstream
      // exchanges by BYTES, so the screened frame otherwise materializes
      // as one-few partitions — and every downstream map-heavy pass
      // (the trainer's feature explode, the scoring classify) inherits
      // that near-serial layout (measured: a 542 ms single-task feature
      // build inside x146 at sf0.1). Compute cost per row here is
      // expression-bound, not byte-bound — the Dedup.spread rule.
      .repartition(pages0.sparkSession.sparkContext.defaultParallelism)
      .localCheckpoint(true)

    ArcStages(pages, screenedPages, survivors, afterNearDup, clean, screened)
  }

  /** The arc FUNNEL (x149): per-stage surviving page and token mass —
    * the first operational question a pipeline owner asks ("which stage
    * is cutting, and how many tokens does it cost?"), the QualityFilter
    * audit-first design applied at pipeline granularity. One row per
    * stage (pages → screened → exact_dedup → near_dup → decontaminated
    * → model_screen → calibrated → capped), all-integer: n_pages and
    * the summed BPE-ish token count. Built from the SAME stage frames
    * as [[pipeline]] (shared builder), so the funnel cannot drift from
    * the selection it describes; a fully screened-out delivery reports
    * zero rows at the calibrated/capped stages instead of crashing the
    * fit.
    *
    * SINGLE PASS: each stage frame carries an `observe()` CollectMetrics
    * node, so the counts ride the arc's own executions (the two
    * checkpoint materializations plus one final aggregate) instead of
    * re-running the arc once per stage — the funnel costs what the
    * pipeline costs, plus seven constant-size metric aggregates.
    */
  def funnel(
      docs: DataFrame,
      evalDocs: DataFrame,
      model: LinearModel.HashedLinearModel,
      cap: Int = 10,
      minIsoPpm: Long = 500000L,
      trainDim: Int = 512,
      trainRounds: Int = 3
  ): DataFrame =
    observedFunnel(
      mkPages = _ => textPages(docs), preNames = Seq.empty,
      pagesStage = "pages", evalDocs = evalDocs, model = model,
      cap = cap, minIsoPpm = minIsoPpm, trainDim = trainDim,
      trainRounds = trainRounds)

  /** The arc's robots.txt fixture (RFC 9309): the `*` group disallows
    * the whole /doc/ tree — a crawler that resolves agent groups wrong
    * empties the corpus, so group selection is load-bearing — while the
    * graftbot group drops documents whose id ends in 3 (star-then-`3/` — a
    * mid-pattern wildcard anchored by the following `3/`) and every
    * third record of a document (the star-then-`/2` rule). Both replay
    * closed-form: doc_id % 10 == 3, rec_idx == 2.
    */
  val arcRobots: String =
    "User-agent: *\nDisallow: /doc/\n\n" +
      "User-agent: graftbot\nDisallow: /doc/*3/\nDisallow: /doc/*/2\n"

  /** The ROBOTS-GATED arc funnel (x151): stage 0 of a real crawl
    * pipeline — the politeness gate between the record walk and
    * everything that costs extract/screen cycles
    * ([[graft.functions.RobotsAllowed]], full RFC 9309 semantics,
    * applied to each record's normalized path BEFORE the screens). One
    * extra funnel row makes the cut auditable: `pages` is the raw walk
    * mass, `robots_allowed` what survives the gate, then the standard
    * chain. Same single-pass observe() posture as [[funnel]].
    */
  def robotsFunnel(
      docs: DataFrame,
      evalDocs: DataFrame,
      model: LinearModel.HashedLinearModel,
      robots: String = arcRobots,
      agent: String = "graftbot/1.0",
      cap: Int = 10,
      minIsoPpm: Long = 500000L,
      trainDim: Int = 512,
      trainRounds: Int = 3
  ): DataFrame =
    observedFunnel(
      mkPages = attach => {
        val walked = attach("pages", textPages(docs, keepPath = true))
        walked
          .where(
            GraftFunctions.robotsAllowed(lit(robots), lit(agent), col("path")))
          .drop("path")
      },
      preNames = Seq("pages"),
      pagesStage = "robots_allowed",
      evalDocs = evalDocs, model = model, cap = cap, minIsoPpm = minIsoPpm,
      trainDim = trainDim, trainRounds = trainRounds)

  /** SINGLE-PASS funnel core shared by [[funnel]] and [[robotsFunnel]]:
    * every head stage carries a CollectMetrics observer inside the
    * arc's OWN executions (the two checkpoint materializations), so the
    * per-stage page/token mass is reported by the run that computes the
    * selection — audit for free, the Diagnostics posture at pipeline
    * granularity. No persist, no second traversal of any stage; the
    * only extra work vs the bare pipeline is the constant-size metric
    * aggregates.
    *
    * @param mkPages   builds the pages frame handed to the stage chain,
    *                  attaching any PRE-stage observers (e.g. the raw
    *                  walk ahead of the robots gate) via the given
    *                  attach function
    * @param preNames  the names mkPages attaches, in funnel order
    * @param pagesStage the name of the chain's first observer (the
    *                  frame mkPages returns)
    */
  private def observedFunnel(
      mkPages: ((String, DataFrame) => DataFrame) => DataFrame,
      preNames: Seq[String],
      pagesStage: String,
      evalDocs: DataFrame,
      model: LinearModel.HashedLinearModel,
      cap: Int,
      minIsoPpm: Long,
      trainDim: Int,
      trainRounds: Int
  ): DataFrame = {
    val spark = evalDocs.sparkSession
    val headNames = preNames ++ Seq(
      pagesStage, "screened", "exact_dedup", "near_dup", "decontaminated",
      "model_screen")
    val obsOf =
      (headNames :+ "calibrated").map(n => n -> Observation(s"arc_$n")).toMap
    def attach(name: String, df: DataFrame): DataFrame = {
      val tok =
        if (df.columns.contains("n_tokens")) col("n_tokens")
        else TextAnalysis.bpeishTokenCount(col("main_text")).cast("long")
      df.observe(
        obsOf(name),
        count(lit(1)).as("n_pages"),
        coalesce(sum(tok), lit(0L)).as("n_tokens"))
    }
    val st = stagesFromPages(mkPages(attach), evalDocs, model, attach, pagesStage)
    def metrics(name: String): (Long, Long) = {
      val m = obsOf(name).get
      (m("n_pages").asInstanceOf[Long], m("n_tokens").asInstanceOf[Long])
    }
    val calIdx = (headNames.size + 1).toLong
    val tail: Seq[(Long, String, Long, Long)] =
      if (st.screened.isEmpty)
        Seq((calIdx, "calibrated", 0L, 0L), (calIdx + 1, "capped", 0L, 0L))
      else {
        val calibrated = attach(
          "calibrated",
          st.screened.drop("y")
            .join(keptPages(st.screened, minIsoPpm, trainDim, trainRounds), "page_id"))
        // ONE action: the capped aggregate is the last stage directly,
        // and its plan contains the calibrated observer (which rides
        // along)
        val capped = capSelect(calibrated, cap)
          .agg(
            count(lit(1)).as("n_pages"),
            coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
          .collect()(0)
        val (cp, ct) = metrics("calibrated")
        Seq(
          (calIdx, "calibrated", cp, ct),
          (calIdx + 1, "capped", capped.getLong(0), capped.getLong(1)))
      }
    val head = headNames.zipWithIndex.map { case (n, i) =>
      val (p, t) = metrics(n)
      ((i + 1).toLong, n, p, t)
    }
    import spark.implicits._
    (head ++ tail).toDF("stage_idx", "stage", "n_pages", "n_tokens")
  }
}
