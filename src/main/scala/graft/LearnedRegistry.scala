package graft

import java.time.{LocalDate, LocalTime}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions
import graft.operators._
import graft.sinks.ParquetSink
import graft.sources.TickerSource

/** Learned-model, calibration, preference/RLHF, spectral and composed
  * web-arc surfaces (x125-x148) with their shared oracle generators.
  *
  * Part of the SparkEntry registry split — see [[SparkEntryBase]].
  */
private[graft] trait LearnedRegistry extends RetrievalRegistry {
  /** Typo/OCR-regime cluster surface (x125): connected components over
    * the x123 d ≤ 2 pair graph — x56's composition one edit further out,
    * where transitive chains actually form (a→b at d=2, b→c at d=2 puts
    * a,c in one cluster at lev(a,c) up to 4 — the canonical-form grouping
    * real entity resolution runs on the blocking graph, not on pairwise
    * distance). Same min-label star contraction, same recursive-CTE
    * transitive-closure oracle with the threshold at 2.
    */
  protected def x125(s: SparkSession, dir: String): DataFrame =
    Cluster
      .connectedComponentsStar(
        Fuzzy
          .editDistance2Pairs(t(s, dir, "part"), "p_name")
          .select(col("a_val").as("a_id"), col("b_val").as("b_id")),
        maxIters = 30
      )
      .select(col("id").as("name"), col("comp").as("cluster_root"))
      .orderBy(col("name"))

  /** The x126/x127 planted fastText-style model: 2 classes × 512 hashed
    * buckets, integer weights from the hash40 closed form — bounded
    * driver state (1024 longs) inlined into the plan as array literals,
    * standing in for an offline-trained quantized classifier. ONE
    * instance shared by both surfaces so the oracles replay one table.
    */
  protected lazy val ftModel = LinearModel.planted("q", classes = 2, dim = 512)

  /** The x130 multi-class head: 4 planted classes over 256 buckets —
    * the language-ID / domain-router shape (fastText's production C is
    * dozens-to-hundreds; 4 exercises every strict-argmax position).
    */
  protected lazy val ftModel4 = LinearModel.planted("m", classes = 4, dim = 256)

  /** Learned-model inference surface (x126): the fastText-style
    * hashed-feature linear classifier ([[graft.operators.LinearModel]])
    * over every document — unigram+bigram bag, hash40 bucketing,
    * per-class BIGINT dots, strict-argmax pred, length-normalized
    * margin. Map-only (weights are literals: zero joins, zero
    * exchanges — the shape a 100 TB full-corpus scorer needs). The
    * oracle rebuilds the weight table from the md5 closed form and
    * replays tokenize → bigram → hash → dot → argmax bit-for-bit (the
    * x91 discipline), so the hash certifies the whole inference path.
    */
  protected def x126(s: SparkSession, dir: String): DataFrame =
    LinearModel
      .classify(dts(s, dir).select(col("doc_id"), col("text")), "text", ftModel)
      .select(
        col("doc_id"), col("n_feats"), col("dot0"), col("dot1"),
        col("pred"), col("margin"))
      .orderBy(col("doc_id"))

  /** Learned-screen curation surface (x127): x120's composed pipeline
    * with the CCNet architecture in the screen slot — the trained
    * classifier (x126's planted model, keep = class 1) replaces the
    * Gopher heuristic cascade; md5 dedup, language screen, and
    * per-source cap unchanged ([[graft.operators.LinearModel
    * .curateWithModel]]). Same two bounded shuffles, zero joins; the
    * model screen is a pure function of `text`, so the screen-first
    * equivalence argument (and the oracle's dedup-first replay) carries
    * over verbatim.
    */
  protected def x127(s: SparkSession, dir: String): DataFrame =
    LinearModel
      .curateWithModel(
        dts(s, dir).select(col("doc_id"), col("source"), col("text")),
        ftModel,
        keepClass = 1L,
        cap = 10)
      .orderBy(col("source"), col("doc_id"))

  /** Trained weights shared by x128/x129 within one JVM, keyed by the
    * corpus dir (the learnedMerges contract at x64: bounded driver
    * state — 512 longs per dir — that is a pure function of the corpus).
    * Bench disclosure, same as x64: when x128 runs first in a session,
    * x129's row measures inference + one reuse of the trained table, not
    * a second training run — the production shape (train once, apply per
    * delivery).
    */
  protected val trainedPerceptron =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  protected def perceptronDocs(s: SparkSession, dir: String): DataFrame =
    dts(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("y", when(col("doc_id") % 2 === 0, 1L).otherwise(-1L))

  protected def perceptronWeights(s: SparkSession, dir: String): Array[Long] =
    trainedPerceptron.computeIfAbsent(
      dir,
      _ =>
        LinearModel
          .trainPerceptron(perceptronDocs(s, dir), "text", "y", dim = 512, rounds = 3)
          ._1)

  /** Learned-model TRAINING surface (x128): fixed-round integer batch
    * perceptron ([[graft.operators.LinearModel.trainPerceptron]]) over
    * the hashed unigram+bigram features, labels planted closed-form
    * (y = +1 iff doc_id is even) so the oracle can replay the ENTIRE
    * training loop — round 1's all-misclassified bootstrap, each round's
    * BIGINT scores, the ≤ 0 misclassification rule, and the synchronous
    * integer weight update — unrolled round by round in SQL (the x118
    * integer-Lloyd discipline applied to learning). Output: the dense
    * 512-bucket trained weight vector.
    */
  protected def x128(s: SparkSession, dir: String): DataFrame = {
    val w = perceptronWeights(s, dir)
    import s.implicits._
    w.zipWithIndex
      .map { case (wv, b) => (b.toLong, wv) }
      .toSeq
      .toDF("b", "w")
      .orderBy(col("b"))
  }

  /** Train-then-infer surface (x129): every document scored under the
    * x128-trained weights through the SAME inference expression x126
    * uses ([[graft.functions.FtBinaryDots]] via a (0, w) binary model —
    * dot1 IS the perceptron score), with the sign prediction and
    * correctness against the planted labels. Certifies the full
    * train → apply composition end to end: the oracle extends x128's
    * unrolled training with one more scoring pass under the final
    * weights.
    */
  protected def x129(s: SparkSession, dir: String): DataFrame = {
    val w = perceptronWeights(s, dir)
    val model = LinearModel.HashedLinearModel(512, Array(Array.fill(512)(0L), w))
    LinearModel
      .classify(perceptronDocs(s, dir), "text", model)
      .select(
        col("doc_id"),
        col("dot1").as("score"),
        when(col("dot1") > 0L, 1L).otherwise(-1L).as("pred_y"),
        col("y").as("true_y"),
        (col("y") * col("dot1") > 0L).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** x134's LOADED model, keyed by dir — the save → load happens once
    * per (corpus, JVM) under the per-key lock; the x124 slot discipline
    * for a filesystem artifact (two racers would overwrite the same
    * deterministic table), with computeIfAbsent as the mutual exclusion.
    */
  protected val loadedModelSlot =
    new java.util.concurrent.ConcurrentHashMap[String, LinearModel.HashedLinearModel]()

  /** Model-artifact round-trip surface (x134): the x128-trained binary
    * weights written as an at-rest catalog table
    * ([[graft.operators.ModelStore]] — the model-registry piece: train
    * and serve are different PROCESSES in production), re-loaded, and
    * served through the SAME scoring pass as x129. Oracled against
    * x129's SQL VERBATIM (the x124 reuse discipline): a hash match
    * proves the persistence layer is invisible to the scores —
    * round-trip-lossless coefficients, dense-grid validation, no silent
    * zero-fill.
    */
  protected def x134(s: SparkSession, dir: String): DataFrame = {
    val loaded = loadedModelSlot.computeIfAbsent(
      dir,
      _ => {
        val trained = LinearModel.HashedLinearModel(
          512, Array(Array.fill(512)(0L), perceptronWeights(s, dir)))
        val table = s"graft_model_x134_${Integer.toHexString(dir.hashCode)}"
        ModelStore.save(s, table, trained)
        ModelStore.load(s, table)
      })
    LinearModel
      .classify(perceptronDocs(s, dir), "text", loaded)
      .select(
        col("doc_id"),
        col("dot1").as("score"),
        when(col("dot1") > 0L, 1L).otherwise(-1L).as("pred_y"),
        col("y").as("true_y"),
        (col("y") * col("dot1") > 0L).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** Preference-rating surface (x136): Bradley-Terry skill fitting over
    * a pairwise-comparison log ([[graft.operators.Preference]] — the
    * RLHF/arena staple). The log is planted from the corpus: consecutive
    * docs compete as items `doc_id % 64`, the longer document (by the
    * table's own n_chars) wins, ties to the lower item — so both engines
    * derive the identical log from first principles. Four MM rounds in
    * BIGINT fixed-point (scale 10⁶, max-normalized), every division a
    * truncating integer div; the oracle unrolls all four rounds
    * (the perceptron/LPA discipline).
    */
  /** The planted pairwise-preference log shared by x136/x141 (one Scala
    * helper, one SQL generator — the substrInjA convention): consecutive
    * docs duel as items `doc_id % 64`, the longer document (by the
    * table's own n_chars) wins, ties to the lower item.
    */
  protected def btComparisons(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    d.as("d1")
      .join(d.as("d2"), col("d2.doc_id") === col("d1.doc_id") + 1)
      .select(
        col("d1.doc_id").as("cmp_id"),
        (col("d1.doc_id") % 64).as("item_a"),
        (col("d2.doc_id") % 64).as("item_b"),
        when(col("d1.n_chars") > col("d2.n_chars"), col("d1.doc_id") % 64)
          .when(col("d2.n_chars") > col("d1.n_chars"), col("d2.doc_id") % 64)
          .otherwise(least(col("d1.doc_id") % 64, col("d2.doc_id") % 64))
          .as("winner"))
      .where(col("item_a") =!= col("item_b"))
  }

  protected def x136(s: SparkSession, dir: String): DataFrame =
    Preference
      .btRatings(
        btComparisons(s, dir).select("item_a", "item_b", "winner"),
        rounds = 4)
      .orderBy(col("item"))

  /** Distributed Bradley-Terry surface (x147): the SAME planted log and
    * four MM rounds as x136, fitted by
    * [[graft.operators.Preference.btRatingsDistributed]] — each round a
    * pairs ⋈ ratings DataFrame step with items-bounded shuffles,
    * per-round localCheckpoint lineage cuts, DECIMAL-exact denominator
    * sums, and a two-phase global rank. The oracle is x136's CTE chain
    * VERBATIM (the x134 reuse discipline): the distributed formulation
    * must be invisible to the fit, so both surfaces hash against the
    * same SQL — lifting the driver-fixpoint contract documented at
    * `Preference.scala`'s scaladoc without changing one rating bit.
    */
  protected def x147(s: SparkSession, dir: String): DataFrame =
    Preference
      .btRatingsDistributed(
        btComparisons(s, dir).select("item_a", "item_b", "winner"),
        rounds = 4)
      .orderBy(col("item"))

  /** Preference-pair curation surface (x141): the RLHF loop closed —
    * x136's fitted board turned back on its own log
    * ([[graft.operators.Preference.curatedPairs]]): per comparison the
    * (chosen, rejected) training pair, both ratings, the signed margin,
    * the model-agreement flag, and the keep gate at margin ≥ 0.1·S.
    * The log never shuffles (items-bounded ratings broadcast onto it);
    * the oracle reuses x136's verbatim CTE chain (btCtesSql).
    */
  protected def x141(s: SparkSession, dir: String): DataFrame = {
    val cmp = btComparisons(s, dir)
    Preference
      .curatedPairs(
        cmp,
        Preference.btRatings(cmp.select("item_a", "item_b", "winner"), rounds = 4),
        minMargin = 100000L)
      .orderBy(col("cmp_id"))
  }

  /** PCA-projection surface (x137): every embedding projected onto the
    * corpus's top principal component ([[graft.operators.Pca]] — the
    * rotation/whitening step in front of IVF/PQ training and the
    * anisotropy diagnostic). Covariance trains on the `vec_id % 2 = 0`
    * HALF of the corpus (rotation trainers sample — the x118 codebook
    * posture, and the gate then exercises the train-on-sample /
    * project-everything split), ten fixed matrix SQUARINGS in truncating
    * integer fixed-point (effective power 1024 — the gate corpus
    * measures λ₂/λ₁ ≈ 0.98 at bench scale, where round-by-round power
    * iteration cannot converge in unrollable rounds). The oracle replays
    * quantization → one-pass moments → n²-scaled covariance → downscale
    * → all ten squarings → the component projection, bit-for-bit.
    */
  protected def x137(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Pca
      .topComponentProjections(t(s, dir, "embeddings"), trainMod = 2, squarings = 10)
      .orderBy(col("vec_id"))
  }

  /** Dimensionality-reduction surface (x143): every embedding projected
    * onto the top FOUR principal components
    * ([[graft.operators.Pca.reduceProjections]] — solve-then-deflate,
    * the front half of an OPQ-style rotate-reduce-index stack). Same
    * train-on-half posture as x137; the integer Hotelling deflation's
    * >2⁶³ intermediates ride Scala BigInt ≡ DuckDB HUGEINT (identical
    * trunc-toward-zero), so the oracle replays all four solve+deflate
    * chains and the four projections bit-for-bit.
    */
  protected def x143(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Pca
      .reduceProjections(t(s, dir, "embeddings"), r = 4, trainMod = 2, squarings = 10)
      .msorted(col("vec_id"))
  }

  /** Adaptive-k PCA surface (x148): explained-variance accounting over
    * the x143 deflation chain ([[graft.operators.Pca.explainedVariance]])
    * — per candidate component its spectral share and cumulative share
    * in exact integer ppm of the covariance trace, plus the chosen k
    * (smallest count clearing the 90% target, rMax = 4 fallback when
    * the spectrum never gets there — which is the HONEST verdict on the
    * near-isotropic gate corpus, the same signal x144 measures as
    * recall collapse). The oracle extends x143's chain with the
    * per-component xᵀCx / xᵀx shares, the trace, and the same k rule.
    */
  protected def x148(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Pca
      .explainedVariance(
        t(s, dir, "embeddings"),
        rMax = 4, targetPpm = 900000L, trainMod = 2, squarings = 10)
      .orderBy(col("comp"))
  }

  /** Cross-space eval surface (x144): what the x143 reduction COSTS
    * retrieval — exact panel top-3 in the reduced 4-dim space measured
    * against exact panel top-3 in the original space
    * ([[graft.operators.Similarity.reducedSpaceRecall]]), per-query
    * recall/RR in exact integer ppm. The eval-family arc closed:
    * reduce (x143) → index → evaluate (x135's metric discipline) —
    * the number every "d→r dims" compression decision needs.
    */
  protected def x144(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val emb = t(s, dir, "embeddings")
    val reduced = Pca
      .reduceProjections(emb, r = 4, trainMod = 2, squarings = 10)
      .select(
        col("vec_id").as("id"),
        array(
          col("p1").cast("double"), col("p2").cast("double"),
          col("p3").cast("double"), col("p4").cast("double")).as("vec"))
    Similarity
      .reducedSpaceRecall(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
        reduced, k = 3, sampleMod = 10)
      .msorted(col("query_id"))
  }

  /** Full web-corpus arc surface (x146): the COMPOSED pipeline — WARC
    * ingest → record walk → URL normalize → HTML extract → Gopher +
    * lang-ID screens → exact dedup → MinHash near-dup → eval-set
    * decontamination → planted-model screen → trained-scorer calibrated
    * keep → per-source cap → next-fit pack ([[graft.operators.WebArc]];
    * every stage an individually oracled operator, chained so
    * cross-stage plan pathologies have a surface to appear on). The
    * oracle CTE-chains the stage oracles (x92's page closed form, x120's
    * screen arithmetic, x07's inverted-index Jaccard, x21's gram
    * overlap, x126's planted dots, x128's unrolled training, x142's
    * bins + minimax fit, x51's cap window, x24's recursive next-fit
    * walk) over the same derived pages. Documents is scanned exactly
    * twice (arc input + eval set) — WebArcSpec pins the plan shape.
    */
  protected def x146(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val docs = t(s, dir, "documents")
    WebArc
      .pipeline(
        docs = docs.select(col("doc_id"), col("source"), col("text")),
        evalDocs = docs.where(col("doc_id") % 50 === 0).select(col("text")),
        model = ftModel)
      .orderBy(col("doc_id"), col("rec_idx"))
  }

  /** Arc-funnel surface (x149): per-stage surviving page count and
    * BPE-ish token mass through the composed web arc
    * ([[graft.operators.WebArc.funnel]] — audit-first at pipeline
    * granularity: the "which stage is cutting, and what does it cost in
    * tokens" report every curation owner reads before touching a
    * threshold). Built from the SAME stage frames as x146 on the Spark
    * side and the SAME CTE chain on the oracle side, so the funnel
    * cannot drift from the selection it describes.
    */
  protected def x149(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val docs = t(s, dir, "documents")
    WebArc
      .funnel(
        docs = docs.select(col("doc_id"), col("source"), col("text")),
        evalDocs = docs.where(col("doc_id") % 50 === 0).select(col("text")),
        model = ftModel)
      .orderBy(col("stage_idx"))
  }

  /** Multimodal arc surface (x150): image payloads through the composed
    * pipeline ([[graft.operators.MediaArc]] — one mixed text+image WARC
    * container, walked by modality route: the FULL x146 text arc on the
    * text/html records, decode-gate → aHash → banded-Hamming near-dup →
    * per-source cap on the image/bmp records, fused into aligned
    * (image, curated text) pairs). The oracle reuses the x146 CTE chain
    * verbatim for the text half (the embedded text records are
    * byte-identical) and replays the image half closed-form from the
    * shared pixel formula (x29/x30's argument), including the every-7th
    * -doc corruption plant the decode gate must drop and the (2k, 2k+1)
    * shared-first-image plant the near-dup stage must catch.
    */
  protected def x150(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val docs = t(s, dir, "documents")
    MediaArc
      .pipeline(
        docs = docs.select(col("doc_id"), col("source"), col("text")),
        evalDocs = docs.where(col("doc_id") % 50 === 0).select(col("text")),
        model = ftModel)
      .orderBy(col("doc_id"), col("img_id"))
  }

  /** Robots-gated arc funnel (x151): a real crawler's stage 0 — every
    * record's normalized path is checked against the host's RFC 9309
    * robots rules BEFORE any extract/screen cycles are spent
    * ([[graft.operators.WebArc.robotsFunnel]]; x99's rule engine
    * composed into the arc). The `*` group disallows everything under
    * /doc/, so resolving the crawler to the wrong agent group would
    * empty the corpus — group selection is load-bearing in the
    * composition, not just in x99's fixture. The oracle chains the
    * closed-form gate replay (doc_id ends in 3, rec_idx 2) into the
    * x146 CTEs and aggregates per stage with the raw walk and gate
    * survivors as the two leading rows.
    */
  protected def x151(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val docs = t(s, dir, "documents")
    WebArc
      .robotsFunnel(
        docs = docs.select(col("doc_id"), col("source"), col("text")),
        evalDocs = docs.where(col("doc_id") % 50 === 0).select(col("text")),
        model = ftModel)
      .orderBy(col("stage_idx"))
  }

  /** Media-route funnel (x152): per-stage image count, payload BYTE
    * mass, and pixel mass through the image half of the multimodal arc
    * ([[graft.operators.MediaArc.funnel]]). The byte column is the
    * point: the walk reports each record's MEASURED Content-Length, and
    * the oracle re-derives it from the byte-layout closed forms (BMP
    * stride/padding; GIF header + color table + LZW code-stream size,
    * including the clear-every-253 and 255-byte sub-block framing) — a
    * hash match proves the container walk consumed real lengths over
    * binary media payloads, the x92/x98 discipline extended to the
    * multimodal front.
    */
  protected def x152(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val docs = t(s, dir, "documents")
    MediaArc
      .funnel(docs.select(col("doc_id"), col("source"), col("text")))
      .orderBy(col("stage_idx"))
  }

  /** Media-container CDX surface (x153): x98's random-access index over
    * the MIXED text+image+audio WARC — one (SURT key, measured byte
    * offset, measured record length, content type) row per resource
    * record, all three modalities. The oracle re-derives every OFFSET
    * from the byte layout: warcinfo + per-text-record header strings
    * (built in SQL and strlen'd, the x98 idiom) + the image records'
    * header strings and payload sizes (the x152 BMP/GIF closed forms)
    * + the audio records' headers and the WAV 44+2n closed form —
    * positions, not just lengths, so a match proves the walk consumed
    * the mixed container at real byte boundaries (a binary payload
    * mis-slice would shift every subsequent offset). Different doc
    * subset (%5 = 1) than x98 so the two CDX surfaces cannot mask each
    * other.
    */
  protected def x153(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val u = GraftFunctions.urlNormalize(col("r.target_uri"))
    t(s, dir, "documents")
      .where(col("doc_id") % 5 === 1)
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        GraftFunctions.buildMediaWarc(col("doc_id"), col("text")).as("bytes"))
      .select(
        col("doc_id"),
        length(col("bytes")).cast("long").as("fsize"),
        posexplode(GraftFunctions.mediaWarcRecords(col("bytes"))).as(Seq("pos", "r")))
      .withColumn("next_off", lead(col("r.rec_offset"), 1).over(w))
      .where(col("r.rec_type") === "resource")
      .select(
        col("doc_id"),
        when(col("r.content_type") === "text/html", "page")
          .when(col("r.content_type") === "audio/wav", "audio")
          .when(col("r.content_type") === "video/avi", "video")
          .otherwise("image").as("rec_kind"),
        when(col("r.content_type") === "text/html", col("pos") - 1)
          .when(
            col("r.content_type") === "audio/wav",
            col("pos") - 3 - col("doc_id") % 3 - col("doc_id") % 2)
          .when(
            col("r.content_type") === "video/avi",
            col("pos") - 4 - col("doc_id") % 3 - (col("doc_id") % 2) * 2)
          .otherwise(col("pos") - 2 - col("doc_id") % 3)
          .cast("int").as("rec_idx"),
        col("r.content_type").as("content_type"),
        concat(
          array_join(reverse(split(u.getField("host"), "\\.")), ","),
          lit(")"),
          u.getField("path")).as("surt_key"),
        col("r.rec_offset").as("rec_offset"),
        (coalesce(col("next_off"), col("fsize")) - col("r.rec_offset")).as("rec_len"))
      .orderBy(col("doc_id"), col("rec_offset"))
  }

  /** Audio-route surface (x154): the container's THIRD modality through
    * the composed curation shape ([[graft.operators.MediaArc.audioRoute]]
    * — walk → REAL PCM decode gate → quality screen (too-short +
    * silence, the clip-corpus Gopher) → exact-fingerprint dedup on the
    * decoded statistic vector → per-source cap). Four plants, one per
    * stage: in-place magic corruption (every 7th doc — dies at the
    * gate), 37 ms clips (pid%7==0 — duration screen), the silence plant
    * (pid%5==4, rms ≈ 72 vs ≈ 1155 — energy screen), and the (2k, 2k+1)
    * shared-seed duplicate (dedup, larger aud_id drops). The oracle
    * re-folds every sample from the closed form
    * floorMod(pid·7919 + i·2657, m) − m∕2 (m = 4001 loud, 251 quiet),
    * so a hash match proves Spark's decoder read REAL bytes to the same
    * integers — the x33 contract, composed.
    */
  protected def x154(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    MediaArc
      .audioRoute(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("text")))
      .orderBy(col("doc_id"), col("aud_id"))
  }

  /** Audio-route funnel (x155): per-stage clip count, payload BYTE
    * mass, and SAMPLE mass through x154's stages
    * ([[graft.operators.MediaArc.audioFunnel]]). The byte column is
    * measured Content-Length re-derived by the oracle from the WAV
    * 44 + 2n closed form — the x152 discipline on the third modality.
    */
  protected def x155(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    MediaArc
      .audioFunnel(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("text")))
      .orderBy(col("stage_idx"))
  }

  /** Video-route surface (x156): the container's FOURTH modality —
    * genuine multi-frame AVIs walked at stride 2
    * ([[graft.operators.MediaArc.videoRoute]]: the "sample every k-th
    * frame" video-pipeline verb AT DECODE TIME — a 100 TB corpus never
    * decodes every frame), then too-few-frames screen → sampled-
    * checksum-sequence dedup → per-source cap. Three plants: magic
    * corruption (gate), frames = 2 stills (screen), the (2k, 2k+1)
    * shared-seed duplicate (dedup). The oracle recomputes every sampled
    * frame's position-weighted checksum from
    * (pid·41 + w·31 + h·17 + f·7 + i·13) mod 256 alone — a hash match
    * proves the movi walk consumed real chunk boundaries (x89's
    * contract, composed).
    */
  protected def x156(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    MediaArc
      .videoRoute(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("text")))
      .orderBy(col("doc_id"), col("vid_id"))
  }

  /** Video-route funnel (x157): per-stage clip count, payload BYTE
    * mass, and sampled-frame mass through x156's stages; byte mass
    * re-derived from the AVI 224 + 32·frames closed form.
    */
  protected def x157(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    MediaArc
      .videoFunnel(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("text")))
      .orderBy(col("stage_idx"))
  }

  /** Two-resource pack surface (x159): the multimodal-SHARD constraint
    * ([[graft.operators.Pack.nextFit2D]]) — a training shard is bounded
    * by its context-window TOKEN budget (256, the x24 capacity) and by
    * its on-disk BYTE budget (16384 — payload bytes dominate once a
    * document carries its media container), and a bin closes when
    * EITHER would overflow. Tokens are the x24 whitespace count; bytes
    * are the doc's MEASURED four-modality container size
    * (length(BuildMediaWarc)), which the oracle re-derives from the
    * shared layout generator — so the pack surface certifies the byte
    * ledger a third way, through a different verb. Same distributed
    * shape as x24: 32 deterministic groups, one per-group sorted
    * aggregate fold, no UDF.
    */
  protected def x159(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val sized = t(s, dir, "documents")
      .select(
        col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"),
        length(GraftFunctions.buildMediaWarc(col("doc_id"), col("text")))
          .cast("long").as("n_bytes"))
    Pack
      .nextFit2D(
        sized,
        idCol = "doc_id",
        tokensCol = "n_tokens",
        bytesCol = "n_bytes",
        capTokens = 256,
        capBytes = 16384,
        numGroups = 32,
        groupExpr = Some(pmod(col("doc_id"), lit(32))))
      .select(
        col("grp"), col("bin"), col("doc"), col("toks"), col("bytes"),
        col("bin_toks"), col("bin_bytes"), col("oversize"))
      .orderBy(col("doc"))
  }

  /** Container-census surface (x158): the whole-container byte LEDGER —
    * one row per record kind (warcinfo/page/image/audio/video) with
    * record count, payload-byte mass, and full record-SPAN mass, plus
    * the container row (file count, total file bytes). The invariant
    * the hash certifies: the spans TILE each file, so
    * Σ kind record_bytes = container bytes; a one-byte mis-slice in any
    * modality's walk breaks exactly that modality's row. Different doc
    * subset (%5 = 2) than x153 (%5 = 1) and x98, so the three
    * byte-layout surfaces cannot mask each other. One walk, one 6-row
    * aggregate; spans from a per-file lead window (bounded by
    * records-per-file).
    */
  protected def x158(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val recs = t(s, dir, "documents")
      .where(col("doc_id") % 5 === 2)
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        GraftFunctions.buildMediaWarc(col("doc_id"), col("text")).as("bytes"))
      .select(
        col("doc_id"),
        length(col("bytes")).cast("long").as("fsize"),
        posexplode(GraftFunctions.mediaWarcRecords(col("bytes"))).as(Seq("pos", "r")))
      .withColumn("next_off", lead(col("r.rec_offset"), 1).over(w))
      .select(
        col("doc_id"), col("fsize"),
        when(col("r.content_type") === "text/html", "page")
          .when(col("r.content_type") === "audio/wav", "audio")
          .when(col("r.content_type") === "video/avi", "video")
          .when(col("r.content_type").startsWith("image/"), "image")
          .otherwise("warcinfo").as("rec_kind"),
        col("r.content_length").cast("long").as("payload_len"),
        (coalesce(col("next_off"), col("fsize")) - col("r.rec_offset")).as("span"))
      .localCheckpoint(true)
    val kinds = recs
      .groupBy(col("rec_kind"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(col("payload_len")).as("payload_bytes"),
        sum(col("span")).as("record_bytes"))
    val container = recs
      .groupBy(col("doc_id")).agg(first(col("fsize")).as("fsize"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(col("fsize")).as("payload_bytes"),
        sum(col("fsize")).as("record_bytes"))
      .select(
        lit("container").as("rec_kind"), col("n_records"),
        col("payload_bytes"), col("record_bytes"))
    kinds.unionByName(container).orderBy(col("rec_kind"))
  }

  /** The x128-trained scorer's output in calibration shape: one
    * (doc_id, score, y) row per document — shared by the x138/x139
    * calibration surfaces so the diagram and the fit cannot drift.
    */
  protected def calibScored(s: SparkSession, dir: String): DataFrame = {
    val w = perceptronWeights(s, dir)
    val model = LinearModel.HashedLinearModel(512, Array(Array.fill(512)(0L), w))
    LinearModel
      .classify(perceptronDocs(s, dir), "text", model)
      .select(col("doc_id"), col("dot1").as("score"), col("y"))
  }

  /** Reliability-diagram surface (x138): observed positive rate per
    * equal-mass score decile of the x128-trained scorer
    * ([[graft.operators.Calibration.reliabilityBins]] — the diagram a
    * curation stack reads before trusting classifier thresholds). Rank
    * deciles via the two-phase global rank (no single-partition
    * window), all rates exact integer ppm; the oracle extends x129's
    * unrolled training replay with the rank/bin/aggregate arithmetic.
    */
  protected def x138(s: SparkSession, dir: String): DataFrame =
    Calibration
      .reliabilityBins(calibScored(s, dir), bins = 10)
      .orderBy(col("bin"))

  /** Isotonic-calibration surface (x139): the monotone rate map over
    * x138's deciles by the minimax characterization (fit_i = max_{j≤i}
    * min_{k≥i} pooled-ppm(j..k) — Robertson-Wright-Dykstra), which
    * replaces PAVA's data-dependent merge loop with a closed bins³ form
    * both engines evaluate directly. The bins table is constant-size
    * (bounded-state contract); the fit is driver arithmetic.
    */
  protected def x139(s: SparkSession, dir: String): DataFrame =
    Calibration
      .isotonicCalibration(calibScored(s, dir), bins = 10)
      .orderBy(col("bin"))

  /** Corpus data-card surface (x140): the per-(source, lang) release
    * summary ([[graft.operators.DomainStats.corpusReport]] — volumes,
    * exact-duplicate mass, emptiness, length envelope, rates in exact
    * integer ppm). Tokens by the x83 whitespace idiom, digests by md5
    * (the x84 convention); only (stratum, digest) pairs shuffle.
    */
  /** Calibrated-screen surface (x142): the calibration USED — every
    * document kept or dropped by whether its bin's ISOTONIC rate clears
    * 0.5 ([[graft.operators.Calibration.calibratedScreen]]): a raw-score
    * threshold cuts at an arbitrary dot value; the calibrated threshold
    * targets precision by construction. One rank pass, the
    * constant-size fit on the driver, a 10-row broadcast back onto the
    * docs.
    */
  protected def x142(s: SparkSession, dir: String): DataFrame =
    Calibration
      .calibratedScreen(calibScored(s, dir), bins = 10, minIsoPpm = 500000L)
      .withColumn("bin", col("bin").cast("long"))
      .msorted(col("doc_id"))

  protected def x140(s: SparkSession, dir: String): DataFrame =
    DomainStats
      .corpusReport(
        t(s, dir, "documents").select(
          col("source"), col("lang"), col("text"), col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")))
      .orderBy(col("source"), col("lang"))

  /** OVA weights shared within one JVM, keyed by corpus dir (the
    * trainedPerceptron contract: bounded driver state — 3 × 128 longs —
    * that is a pure function of the corpus; the warm-up rep pays the
    * training, timed reps measure the train-once/apply-per-delivery
    * production shape, disclosed as with x64/x128).
    */
  protected val trainedOva =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Long]]]()

  protected def ovaDocs(s: SparkSession, dir: String): DataFrame =
    dts(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("cls", col("doc_id") % 3L)

  protected def ovaWeights(s: SparkSession, dir: String): Array[Array[Long]] =
    trainedOva.computeIfAbsent(
      dir,
      _ =>
        LinearModel
          .trainPerceptronOva(
            ovaDocs(s, dir), "text", "cls", numClasses = 3, dim = 128, rounds = 2)
          .map(_._1)
          .toArray)

  /** Multi-class train-then-infer surface (x131): three one-vs-all
    * integer perceptrons ([[graft.operators.LinearModel
    * .trainPerceptronOva]] — ONE persisted label-independent
    * feature-count table feeds all three training loops) over the
    * planted 3-way classes (cls = doc_id mod 3), then every document
    * scored under the trained 3×128 head through the SAME
    * [[graft.functions.FtMultiDots]] walk x130 uses, with the
    * strict-argmax prediction and correctness against the plant. The
    * oracle unrolls all three training chains (the x128 discipline,
    * prefixed per class) plus the final scoring joins — a hash match
    * certifies the complete multi-class learn → apply composition.
    */
  protected def x131(s: SparkSession, dir: String): DataFrame = {
    val model = LinearModel.HashedLinearModel(128, ovaWeights(s, dir))
    LinearModel
      .classify(ovaDocs(s, dir), "text", model)
      .select(
        col("doc_id"),
        col("dot0").as("score0"),
        col("dot1").as("score1"),
        col("dot2").as("score2"),
        col("pred").as("pred_cls"),
        col("cls").as("true_cls"),
        (col("pred") === col("cls")).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** Model-evaluation surface (x132): the per-class confusion row —
    * tp/fp/fn counts plus exact integer-ppm precision, recall, and F1
    * (f1_ppm = 2·tp·10⁶ ∕ (2·tp + fp + fn), one BIGINT division — the
    * harmonic mean rewritten so it never touches floats) — over x131's
    * trained one-vs-all predictions vs the planted classes. The eval
    * half every training pipeline runs after the infer half; one
    * class-keyed aggregation over the scored frame (3 groups — the
    * exchange is O(classes), not O(corpus)). The oracle extends x131's
    * unrolled train+score replay with the same confusion aggregation.
    */
  protected def x132(s: SparkSession, dir: String): DataFrame = {
    val model = LinearModel.HashedLinearModel(128, ovaWeights(s, dir))
    val scored = LinearModel
      .classify(ovaDocs(s, dir), "text", model)
      .select(col("pred").as("pred_cls"), col("cls").as("true_cls"))
    // contingency cells first (ONE count pass over the corpus, ≤ 9 rows
    // out), then the per-class tp/fp/fn pivot over the tiny cell frame —
    // never explode the corpus per class
    val cells = scored.groupBy(col("true_cls"), col("pred_cls")).count()
    val byClass = cells
      .select(explode(array((0 until 3).map(c => lit(c.toLong)): _*)).as("cls"),
        col("pred_cls"), col("true_cls"), col("count"))
      .groupBy(col("cls"))
      .agg(
        sum(when(col("true_cls") === col("cls") && col("pred_cls") === col("cls"),
          col("count")).otherwise(0L)).as("tp"),
        sum(when(col("true_cls") =!= col("cls") && col("pred_cls") === col("cls"),
          col("count")).otherwise(0L)).as("fp"),
        sum(when(col("true_cls") === col("cls") && col("pred_cls") =!= col("cls"),
          col("count")).otherwise(0L)).as("fn"))
    byClass
      .select(
        col("cls"),
        col("tp"), col("fp"), col("fn"),
        expr("tp * 1000000 div greatest(tp + fp, 1)").as("precision_ppm"),
        expr("tp * 1000000 div greatest(tp + fn, 1)").as("recall_ppm"),
        expr("tp * 2000000 div greatest(tp * 2 + fp + fn, 1)").as("f1_ppm"))
      .orderBy(col("cls"))
  }

  /** Active-learning selection surface (x133): uncertainty sampling
    * (Lewis &amp; Gale 1994, the annotation-targeting staple) — the 5
    * LOWEST-margin documents per predicted class under x131's trained
    * one-vs-all head, margin = best dot − runner-up dot
    * (2·max + min − Σ, all BIGINT). Ranking goes through the bounded
    * [[graft.functions.TopKByLongScore]] partial top-k on the NEGATED
    * margin — map-side ≤ k rows per class per task — instead of a
    * per-class window, whose 3 partitions would funnel the corpus
    * through 3 tasks (the group-rank lesson). Oracle: x131's replay +
    * the margin arithmetic + row_number per class.
    */
  protected def x133(s: SparkSession, dir: String): DataFrame = {
    val model = LinearModel.HashedLinearModel(128, ovaWeights(s, dir))
    LinearModel
      .classify(ovaDocs(s, dir), "text", model)
      .withColumn(
        "unc",
        greatest(col("dot0"), col("dot1"), col("dot2")) * 2L +
          least(col("dot0"), col("dot1"), col("dot2")) -
          (col("dot0") + col("dot1") + col("dot2")))
      .groupBy(col("pred").as("pred_cls"))
      .agg(GraftFunctions.topKByLongScore(-col("unc"), col("doc_id"), 5).as("top"))
      .select(col("pred_cls"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(
        col("pred_cls"),
        (col("pos") + 1).cast("long").as("rank"),
        col("t.neighbor_id").as("doc_id"),
        (-col("t.score")).as("margin"))
      .orderBy(col("pred_cls"), col("rank"))
  }

  /** Multi-class learned-inference surface (x130): the 4-class planted
    * head over 256 hashed buckets — the language-ID / domain-router
    * shape — scored through [[graft.functions.FtMultiDots]] (one
    * plain-JVM token walk charging each hashed bucket to all four
    * classes; the FtBinaryDots lesson generalized, vs four interpreted
    * HOF folds per row). Same map-only zero-exchange plan as x126; the
    * oracle rebuilds the 4×256 weight table closed-form and replays
    * features → buckets → four BIGINT dots → strict smallest-index
    * argmax bit-for-bit.
    */
  protected def x130(s: SparkSession, dir: String): DataFrame =
    LinearModel
      .classify(dts(s, dir).select(col("doc_id"), col("text")), "text", ftModel4)
      .select(
        col("doc_id"), col("n_feats"),
        col("dot0"), col("dot1"), col("dot2"), col("dot3"), col("pred"))
      .orderBy(col("doc_id"))

  /** The label/weight-independent feature half: tokenize → unigram +
    * adjacent-bigram bag → hash40("ft:" + f) mod dim buckets. Yields
    * `fttk`, `ftfeats`, `ftfb` — everything a trainer needs (the Scala
    * twin of this independence is [[graft.operators.LinearModel
    * .trainPerceptronOva]] building ONE persisted count table for all C
    * models).
    */
  protected def ftFeatureCtes(dim: Int): String = ftFeatureCtesOver(dim, "documents")

  /** [[ftFeatureCtes]] over an arbitrary (doc_id, text) CTE/table — the
    * x146 composed arc scores DERIVED pages (page_id AS doc_id, main_text
    * AS text), not the documents table; one generator so the feature walk
    * cannot drift between the standalone and composed oracles.
    */
  protected def ftFeatureCtesOver(dim: Int, src: String): String =
    s"""fttk AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM $src
       |), ftfeats AS (
       |  SELECT doc_id, unnest(toks) AS f FROM fttk
       |  UNION ALL
       |  SELECT doc_id,
       |    unnest([toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))]) AS f
       |  FROM fttk WHERE len(toks) >= 2
       |), ftfb AS (
       |  SELECT doc_id, CAST(($kmvHexToIntSql) % $dim AS BIGINT) AS b
       |  FROM (SELECT doc_id, substr(md5('ft:' || f), 1, 10) AS h FROM ftfeats)
       |)""".stripMargin

  /** Shared DuckDB replay CTEs for the fastText-style scorers — ONE
    * generator parameterized exactly like
    * [[graft.operators.LinearModel.planted]] (seed, classes, dim): the
    * planted classes×dim integer weight table from the md5 closed form
    * (hash40("ftw:&lt;seed&gt;:c:b") mod 2001 − 1000), the
    * [[ftFeatureCtes]] feature half, per-class BIGINT dots. Yields CTEs
    * `ftw`, `ftwp` (pivoted per-bucket w0..w{C−1}), `fttk`, `ftfeats`,
    * `ftfb`, `ftdots` (doc_id, n_feats, dot0..dot{C−1}) — spliced after
    * WITH. One helper for every learned-inference oracle (x126/x127
    * binary, x128/x129 via `ftfb`, x130 4-class) so none can drift from
    * the others or from the Scala literals.
    */
  protected def ftCtes(seed: String, classes: Int, dim: Int): String =
    ftCtesOver(seed, classes, dim, "documents")

  protected def ftCtesOver(seed: String, classes: Int, dim: Int, src: String): String = {
    val pivot = (0 until classes)
      .map(c => s"max(CASE WHEN c = $c THEN w END) AS w$c")
      .mkString(",\n       |         ")
    val dots = (0 until classes)
      .map(c => s"CAST(sum(w.w$c) AS BIGINT) AS dot$c")
      .mkString(",\n       |    ")
    s"""ftw AS (
       |  SELECT c, b, CAST(($kmvHexToIntSql) % 2001 AS BIGINT) - 1000 AS w
       |  FROM (SELECT c, b, substr(md5('ftw:$seed:' || c || ':' || b), 1, 10) AS h
       |        FROM range(0, $classes) r1(c), range(0, $dim) r2(b))
       |), ftwp AS (
       |  SELECT b, $pivot
       |  FROM ftw GROUP BY b
       |), ${ftFeatureCtesOver(dim, src)}, ftdots AS (
       |  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |    $dots
       |  FROM ftfb f JOIN ftwp w USING (b) GROUP BY 1
       |)""".stripMargin
  }

  /** The x126/x127/x128/x129 binary instance (the planted 2×512 model). */
  protected val ftCtesSql: String = ftCtes("q", classes = 2, dim = 512)

  /** Shared DuckDB replay CTEs for the x128/x129 integer batch
    * perceptron — spliced AFTER [[ftCtesSql]] (reuses its `ftfb`
    * feature-bucket rows). Yields `fc` (doc_id, b, cnt, y with the
    * planted even-odd label), a dense `w1` (round 1 updates on every doc
    * because w₀ = 0 scores everything 0 and y·0 ≤ 0), and for each round
    * r ≥ 2 the score/mis/delta/update chain `sc{r}`/`m{r}`/`d{r}`/`w{r}`
    * — ONE Scala generator so the unrolled SQL cannot drift from
    * [[graft.operators.LinearModel.trainPerceptron]]'s loop.
    */
  protected def perceptronCtesSql(
      rounds: Int,
      dim: Int,
      labelSql: String = "CASE WHEN doc_id % 2 = 0 THEN CAST(1 AS BIGINT) " +
        "ELSE CAST(-1 AS BIGINT) END",
      pfx: String = "",
      fbSrc: String = "ftfb"): String = {
    val head =
      s"""${pfx}fc AS (
         |  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS cnt,
         |    $labelSql AS y
         |  FROM $fbSrc GROUP BY 1, 2
         |), ${pfx}d1 AS (
         |  SELECT b, sum(y * cnt) AS dw FROM ${pfx}fc GROUP BY b
         |), ${pfx}w1 AS (
         |  SELECT r.range AS b, CAST(coalesce(${pfx}d1.dw, 0) AS BIGINT) AS w
         |  FROM range(0, $dim) r LEFT JOIN ${pfx}d1 ON ${pfx}d1.b = r.range
         |)""".stripMargin
    val tail = (2 to rounds).map { r =>
      val p = s"${pfx}w${r - 1}"
      s""", ${pfx}sc$r AS (
         |  SELECT fc.doc_id, fc.y, sum(fc.cnt * $p.w) AS score
         |  FROM ${pfx}fc fc JOIN $p ON $p.b = fc.b GROUP BY 1, 2
         |), ${pfx}m$r AS (
         |  SELECT doc_id FROM ${pfx}sc$r WHERE y * score <= 0
         |), ${pfx}d$r AS (
         |  SELECT fc.b, sum(fc.y * fc.cnt) AS dw
         |  FROM ${pfx}fc fc JOIN ${pfx}m$r USING (doc_id) GROUP BY 1
         |), ${pfx}w$r AS (
         |  SELECT p.b, CAST(p.w + coalesce(${pfx}d$r.dw, 0) AS BIGINT) AS w
         |  FROM $p p LEFT JOIN ${pfx}d$r ON ${pfx}d$r.b = p.b
         |)""".stripMargin
    }.mkString
    head + tail
  }

  /** x129's full replay — shared VERBATIM with x134 (the x124 reuse
    * discipline): the model-table round-trip must be invisible to the
    * scores, so both surfaces hash against the same SQL.
    */
  protected lazy val x129OracleSql: String =
    s"""WITH $ftCtesSql, ${perceptronCtesSql(rounds = 3, dim = 512)}, sc4 AS (
      |  SELECT fc.doc_id, fc.y, sum(fc.cnt * w3.w) AS score
      |  FROM fc JOIN w3 ON w3.b = fc.b GROUP BY 1, 2
      |)
      |SELECT doc_id, CAST(score AS BIGINT) AS score,
      |  CASE WHEN score > 0 THEN CAST(1 AS BIGINT)
      |       ELSE CAST(-1 AS BIGINT) END AS pred_y,
      |  y AS true_y, (y * score > 0) AS correct
      |FROM sc4 ORDER BY doc_id""".stripMargin

  /** Shared DuckDB replay for x138/x139: x129's unrolled-training chain
    * scored once more (`sc4`), then rank deciles and per-bin integer
    * aggregates — yields `cg` (bin, n_docs, n_pos, min/max/sum_score).
    * ONE helper so the diagram and the isotonic fit cannot drift.
    */
  protected lazy val calibBinsSql: String =
    s"""$ftCtesSql, ${perceptronCtesSql(rounds = 3, dim = 512)}, sc4 AS (
      |  SELECT fc.doc_id, fc.y, sum(fc.cnt * w3.w) AS score
      |  FROM fc JOIN w3 ON w3.b = fc.b GROUP BY 1, 2
      |), cr AS (
      |  SELECT doc_id, y, CAST(score AS BIGINT) AS score,
      |    row_number() OVER (ORDER BY score, doc_id) AS rank,
      |    count(*) OVER () AS n
      |  FROM sc4
      |), cb AS MATERIALIZED (
      |  SELECT doc_id, y, score, (rank - 1) * 10 // n AS bin FROM cr
      |), cg AS MATERIALIZED (
      |  SELECT bin,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |    CAST(min(score) AS BIGINT) AS min_score,
      |    CAST(max(score) AS BIGINT) AS max_score,
      |    CAST(sum(score) AS BIGINT) AS sum_score
      |  FROM cb GROUP BY 1
      |)""".stripMargin

  /** The isotonic-fit CTE chain over `cg` (x139/x142 shared): prefix
    * sums → pooled ppm rates for every j ≤ k bin range → the minimax
    * fold — yields `cfit` (bin, iso_ppm).
    */
  protected lazy val isoFitSql: String =
    """ccum AS MATERIALIZED (
      |  SELECT bin,
      |    sum(n_pos) OVER (ORDER BY bin) AS cpos,
      |    sum(n_docs) OVER (ORDER BY bin) AS cn
      |  FROM cg
      |), crng AS MATERIALIZED (
      |  SELECT j.bin AS j, k.bin AS k,
      |    (k.cpos - coalesce(jm.cpos, 0)) * 1000000
      |      // greatest(k.cn - coalesce(jm.cn, 0), 1) AS rate
      |  FROM ccum j JOIN ccum k ON j.bin <= k.bin
      |  LEFT JOIN ccum jm ON jm.bin = j.bin - 1
      |), cmins AS (
      |  SELECT i.bin AS bin, r.j, min(r.rate) AS mn
      |  FROM cg i JOIN crng r ON r.j <= i.bin AND r.k >= i.bin
      |  GROUP BY 1, 2
      |), cfit AS MATERIALIZED (
      |  SELECT bin, CAST(max(mn) AS BIGINT) AS iso_ppm FROM cmins GROUP BY 1
      |)""".stripMargin

  /** The x146 composed-arc oracle: every stage of [[graft.operators
    * .WebArc.pipeline]] replayed as one CTE chain over the SAME derived
    * pages — the x92 page/main_text closed form, the x120 screen
    * arithmetic, exact dedup, the inverted-index exact-Jaccard pair set
    * (the x07 oracle posture: LSH candidates at (32, 4) provably/
    * measuredly cover every qualifying pair at the tested SFs, and the
    * engine verifies candidates with the same exact Jaccard), the x21
    * gram-overlap decontamination, the planted-model dots
    * ([[ftCtesOver]] retargeted at the derived pages), the UNROLLED
    * 3-round perceptron training over the screened subset
    * ([[perceptronCtesSql]] with the page-parity label page_id//4 % 2),
    * rank-decile bins + the minimax isotonic fit ([[isoFitSql]]), the
    * per-source cap window, and the recursive next-fit pack walk (x24).
    */
  /** The bpe-ish token regex shared by the arc chain and the funnel's
    * per-stage token sums.
    */
  private val webArcBpeish = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** The x146 stage chain through `afin` (capped pages) — shared by the
    * arc's final-select oracle and the x149 funnel oracle so the two
    * replays cannot drift. Spliced after WITH RECURSIVE.
    */
  protected lazy val webArcChainSql: String = webArcChain(robotsGated = false)

  /** The arc CTE chain, optionally with the x151 robots gate as stage 0:
    * `apr` filters the derived pages on the closed-form replay of
    * [[graft.operators.WebArc.arcRobots]]'s graftbot group (the
    * star-then-`3/` rule ↔ doc_id ends in 3, the star-then-`/2` rule ↔
    * rec_idx 2) and the chain
    * reads from it. With the gate off the emitted string is the x146/
    * x149 chain verbatim.
    */
  protected def webArcChain(robotsGated: Boolean): String = {
    val pagesSrc = if (robotsGated) "apr" else "ap"
    val robotsCte =
      if (robotsGated)
        """, apr AS (
          |  SELECT * FROM ap WHERE doc_id % 10 <> 3 AND rec_idx <> 2
          |)""".stripMargin
      else ""
    val markers = TextAnalysis.langMarkers
    val stopList = markers.head._2.map(w => s"'$w'").mkString(",")
    val scoreCols = markers
      .map { case (lang, ws) =>
        s"len(list_filter(toks, t -> list_contains([${ws.map(w => s"'$w'").mkString(",")}], t))) AS s_$lang"
      }
      .mkString(",\n      |    ")
    val best = markers.map(m => s"s_${m._1}").mkString("greatest(", ", ", ")")
    val langCase = markers.init
      .map { case (lang, _) => s"WHEN s_$lang = $best THEN '$lang'" }
      .mkString("\n      |    ")
    val bpeish = webArcBpeish
    s"""aw AS (
      |  SELECT doc_id, source, CAST(doc_id AS VARCHAR) AS ids,
      |    1 + doc_id % 3 AS nrec,
      |    trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g')) AS t
      |  FROM documents
      |), ap0 AS (
      |  SELECT doc_id, source, ids, t, unnest(range(nrec)) AS i FROM aw
      |), ap AS (
      |  SELECT doc_id, source, CAST(i AS INT) AS rec_idx,
      |    doc_id * 4 + i AS page_id, 'example.com' AS host,
      |    'Heading ' || ids || '!' ||
      |      CASE WHEN length(t) > 1 + length(ids)
      |        THEN ' ' || CASE WHEN t = '' THEN 'see ref ' || ids
      |                         ELSE t || ' see ref ' || ids END
      |        ELSE '' END AS main_text
      |  FROM ap0
      |)$robotsCte, atk AS (
      |  SELECT *, string_split_regex(trim(main_text), '\\s+') AS toks FROM $pagesSrc
      |), ag AS (
      |  SELECT *,
      |    CAST(len(toks) AS BIGINT) AS n_tok,
      |    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_chars,
      |    CAST(len(list_intersect(toks, [$stopList])) AS BIGINT) AS n_stop
      |  FROM atk
      |), aq AS (
      |  SELECT * FROM ag
      |  WHERE n_tok BETWEEN 30 AND 90
      |    AND 30 * n_tok <= 10 * sum_chars AND 10 * sum_chars <= 52 * n_tok
      |    AND n_stop >= 2
      |), amk AS (
      |  SELECT *,
      |    $scoreCols
      |  FROM aq
      |), alng AS (
      |  SELECT *, CASE
      |    WHEN $best = 0 THEN 'und'
      |    $langCase
      |    ELSE '${markers.last._1}' END AS lang_pred
      |  FROM amk
      |), ascp AS (
      |  SELECT * FROM alng WHERE lang_pred <> 'und'
      |), adup AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY md5(main_text) ORDER BY page_id) AS rn_dup
      |  FROM ascp
      |), asv AS MATERIALIZED (
      |  SELECT * FROM adup WHERE rn_dup = 1
      |), ash AS MATERIALIZED (
      |  SELECT page_id,
      |    CASE WHEN len(toks) >= 3 THEN
      |      list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                     for i in range(1, len(toks) - 1)])
      |    ELSE [] END AS s
      |  FROM asv
      |), ajsz AS (
      |  SELECT page_id, len(s) AS sz FROM ash
      |), ajinv AS (
      |  SELECT page_id, unnest(s) AS g FROM ash
      |), ajc AS (
      |  SELECT a.page_id AS a_id, b.page_id AS b_id, count(*) AS inter
      |  FROM ajinv a JOIN ajinv b ON a.g = b.g AND a.page_id < b.page_id
      |  GROUP BY 1, 2
      |), andrp AS (
      |  SELECT DISTINCT b_id FROM ajc
      |  JOIN ajsz sa ON sa.page_id = a_id
      |  JOIN ajsz sb ON sb.page_id = b_id
      |  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
      |), anear AS MATERIALIZED (
      |  SELECT * FROM asv WHERE page_id NOT IN (SELECT b_id FROM andrp)
      |), aevt AS (
      |  SELECT string_split_regex(trim(text), '\\s+') AS toks
      |  FROM documents WHERE doc_id % 50 = 0
      |), aev AS (
      |  SELECT DISTINCT unnest(
      |    CASE WHEN len(toks) >= 3 THEN
      |      list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                     for i in range(1, len(toks) - 1)])
      |    ELSE [] END) AS gram
      |  FROM aevt
      |), adcg AS (
      |  SELECT a.page_id, len(h.s) AS n_grams, unnest(h.s) AS gram
      |  FROM anear a JOIN ash h USING (page_id)
      |), adct AS (
      |  SELECT page_id FROM adcg JOIN aev USING (gram)
      |  GROUP BY page_id, n_grams
      |  HAVING round(CAST(count(*) AS DOUBLE) / n_grams, 4) >= 0.5
      |), acln AS MATERIALIZED (
      |  SELECT * FROM anear WHERE page_id NOT IN (SELECT page_id FROM adct)
      |), adoc AS MATERIALIZED (
      |  SELECT page_id AS doc_id, main_text AS text FROM acln
      |), ${ftCtesOver("q", classes = 2, dim = 512, src = "adoc")}, amscr AS MATERIALIZED (
      |  SELECT a.* FROM acln a
      |  JOIN ftdots d ON d.doc_id = a.page_id WHERE d.dot1 > d.dot0
      |), ${perceptronCtesSql(
          rounds = 3,
          dim = 512,
          labelSql = "CASE WHEN (doc_id // 4) % 2 = 0 THEN CAST(1 AS BIGINT) " +
            "ELSE CAST(-1 AS BIGINT) END",
          fbSrc = "(SELECT f.doc_id, f.b FROM ftfb f " +
            "JOIN amscr s ON s.page_id = f.doc_id)")}, asc4 AS (
      |  SELECT fc.doc_id AS page_id, fc.y,
      |    CAST(sum(fc.cnt * w3.w) AS BIGINT) AS score
      |  FROM fc JOIN w3 ON w3.b = fc.b GROUP BY 1, 2
      |), acr AS (
      |  SELECT page_id, y, score,
      |    row_number() OVER (ORDER BY score, page_id) AS rank,
      |    count(*) OVER () AS n
      |  FROM asc4
      |), acb AS MATERIALIZED (
      |  SELECT page_id, y, score, (rank - 1) * 10 // n AS bin FROM acr
      |), cg AS MATERIALIZED (
      |  SELECT bin,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
      |  FROM acb GROUP BY 1
      |), $isoFitSql, akpt AS (
      |  SELECT b.page_id, b.score, f.iso_ppm
      |  FROM acb b JOIN cfit f USING (bin) WHERE f.iso_ppm >= 500000
      |), acal AS (
      |  SELECT s.source, s.doc_id, s.rec_idx, s.page_id, s.host,
      |    s.lang_pred, s.main_text, k.score, k.iso_ppm
      |  FROM amscr s JOIN akpt k USING (page_id)
      |), acap AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY source ORDER BY md5(main_text), page_id) AS rn_cap
      |  FROM acal
      |), afin AS MATERIALIZED (
      |  SELECT source, doc_id, rec_idx, page_id, host, lang_pred,
      |    CAST(len(regexp_extract_all(main_text, '$bpeish')) AS BIGINT)
      |      AS n_tokens,
      |    score, iso_ppm
      |  FROM acap WHERE rn_cap <= 10
      |)""".stripMargin
  }

  protected lazy val webArcOracleSql: String =
    s"""WITH RECURSIVE $webArcChainSql, arnk AS (
      |  SELECT page_id, n_tokens, page_id % 8 AS grp,
      |    row_number() OVER (PARTITION BY page_id % 8 ORDER BY page_id) AS prn
      |  FROM afin
      |), awalk AS (
      |  SELECT page_id, grp, n_tokens, prn,
      |    CAST(0 AS BIGINT) AS bin, n_tokens AS fill
      |  FROM arnk WHERE prn = 1
      |  UNION ALL
      |  SELECT r.page_id, r.grp, r.n_tokens, r.prn,
      |    CASE WHEN w.fill + r.n_tokens > 256 AND w.fill > 0
      |         THEN w.bin + 1 ELSE w.bin END,
      |    CASE WHEN w.fill + r.n_tokens > 256 AND w.fill > 0
      |         THEN r.n_tokens ELSE w.fill + r.n_tokens END
      |  FROM arnk r JOIN awalk w ON r.grp = w.grp AND r.prn = w.prn + 1
      |)
      |SELECT f.source, f.doc_id, f.rec_idx, f.host, f.lang_pred,
      |  f.n_tokens, f.score, f.iso_ppm,
      |  w.grp AS pack_grp, w.bin AS pack_bin,
      |  CAST(sum(w.n_tokens) OVER (PARTITION BY w.grp, w.bin) AS BIGINT)
      |    AS bin_fill
      |FROM awalk w JOIN afin f USING (page_id)
      |ORDER BY f.doc_id, f.rec_idx""".stripMargin

  private def funnelAggSql(idx: Int, name: String, src: String, tok: String): String =
    s"""SELECT CAST($idx AS BIGINT) AS stage_idx, '$name' AS stage,
       |  CAST(count(*) AS BIGINT) AS n_pages,
       |  CAST(coalesce(sum($tok), 0) AS BIGINT) AS n_tokens
       |FROM $src""".stripMargin

  private lazy val funnelRecountSql: String =
    s"CAST(len(regexp_extract_all(main_text, '$webArcBpeish')) AS BIGINT)"

  /** The x149 funnel oracle: the SAME chain, aggregated per stage —
    * count + BPE-ish token mass at pages / screened / exact_dedup /
    * near_dup / decontaminated / model_screen / calibrated / capped.
    */
  protected lazy val webArcFunnelSql: String = {
    val recount = funnelRecountSql
    s"""WITH RECURSIVE $webArcChainSql
      |${funnelAggSql(1, "pages", "ap", recount)}
      |UNION ALL ${funnelAggSql(2, "screened", "ascp", recount)}
      |UNION ALL ${funnelAggSql(3, "exact_dedup", "asv", recount)}
      |UNION ALL ${funnelAggSql(4, "near_dup", "anear", recount)}
      |UNION ALL ${funnelAggSql(5, "decontaminated", "acln", recount)}
      |UNION ALL ${funnelAggSql(6, "model_screen", "amscr", recount)}
      |UNION ALL ${funnelAggSql(7, "calibrated", "acal", recount)}
      |UNION ALL ${funnelAggSql(8, "capped", "afin", "n_tokens")}
      |ORDER BY stage_idx""".stripMargin
  }

  /** The x151 robots-gated funnel oracle: the gated chain
    * ([[webArcChain]] with `apr`), aggregated per stage with the raw
    * walk (`ap`) and the gate survivors (`apr`) as the two leading rows.
    */
  protected lazy val webArcRobotsFunnelSql: String = {
    val recount = funnelRecountSql
    s"""WITH RECURSIVE ${webArcChain(robotsGated = true)}
      |${funnelAggSql(1, "pages", "ap", recount)}
      |UNION ALL ${funnelAggSql(2, "robots_allowed", "apr", recount)}
      |UNION ALL ${funnelAggSql(3, "screened", "ascp", recount)}
      |UNION ALL ${funnelAggSql(4, "exact_dedup", "asv", recount)}
      |UNION ALL ${funnelAggSql(5, "near_dup", "anear", recount)}
      |UNION ALL ${funnelAggSql(6, "decontaminated", "acln", recount)}
      |UNION ALL ${funnelAggSql(7, "model_screen", "amscr", recount)}
      |UNION ALL ${funnelAggSql(8, "calibrated", "acal", recount)}
      |UNION ALL ${funnelAggSql(9, "capped", "afin", "n_tokens")}
      |ORDER BY stage_idx""".stripMargin
  }

  /** The shared image-half CTEs for x150/x152: ALL image records with
    * their byte-layout sizes closed-form (`msz` — BMP stride/padding
    * arithmetic; GIF header + 256-entry color table + LZW code-stream
    * size: 9-bit codes, one code per pixel plus a clear every 253
    * literals plus init-clear and EOI, 255-byte sub-block framing), the
    * uncorrupted subset (`mdim` — the corruption plant excluded), the
    * closed-form aHashes (`mh`), banded Hamming candidates and greedy
    * keep-first drops, survivors (`msurv`), and the per-source cap
    * window (`mcap`).
    */
  protected lazy val mediaImageCtesSql: String =
    s"""mi0 AS (
      |  SELECT doc_id, source, unnest(range(1 + doc_id % 2)) AS j
      |  FROM documents
      |), miall AS (
      |  SELECT doc_id, source, CAST(j AS INTEGER) AS img_j,
      |    doc_id * 2 + j AS img_id, (doc_id // 2) * 2 + j AS pid,
      |    (doc_id + j) % 2 = 1 AS is_gif
      |  FROM mi0
      |), mda AS (
      |  SELECT *, CAST(16 + pid % 16 AS INTEGER) AS w,
      |    CAST(16 + pid % 12 AS INTEGER) AS h
      |  FROM miall
      |), msz0 AS (
      |  SELECT *, CAST(w AS BIGINT) * h AS npx FROM mda
      |), msz1 AS (
      |  SELECT *, (9 * (npx + 2 + (npx - 1) // 253) + 7) // 8 AS nb FROM msz0
      |), msz AS MATERIALIZED (
      |  SELECT *, CAST(CASE WHEN is_gif
      |      THEN 792 + nb + (nb + 254) // 255 + 2
      |      ELSE 54 + ((3 * w + 3) // 4) * 4 * h END AS BIGINT) AS n_bytes
      |  FROM msz1
      |), mdim AS MATERIALIZED (
      |  SELECT doc_id, source, img_j, img_id, pid, w, h FROM msz
      |  WHERE doc_id % 7 <> 0
      |), mxs AS (
      |  SELECT img_id, pid, w, h, unnest(range(w)) AS x FROM mdim
      |), mpx AS (
      |  SELECT img_id, pid, w, h, x, unnest(range(h)) AS y FROM mxs
      |), mlum AS (
      |  SELECT img_id, (y * 8) // h AS ci, (x * 8) // w AS cj,
      |    (pid * 131 + x * 7 + y * 13) % 256 AS g
      |  FROM mpx
      |), mcells AS (
      |  SELECT img_id, ci, cj, sum(g) AS cs, count(*) AS cn
      |  FROM mlum GROUP BY 1, 2, 3
      |), mtot AS (
      |  SELECT img_id, sum(g) AS ts, count(*) AS tn FROM mlum GROUP BY 1
      |), mbits AS (
      |  SELECT c.img_id, c.ci * 8 + c.cj AS p,
      |    CASE WHEN c.cs * t.tn >= t.ts * c.cn THEN 1 ELSE 0 END AS bit
      |  FROM mcells c JOIN mtot t USING (img_id)
      |), mh AS MATERIALIZED (
      |  SELECT img_id,
      |    CAST(sum(CASE WHEN bit = 1 AND p < 16 THEN (CAST(1 AS BIGINT) << (15 - p)) ELSE 0 END) AS BIGINT) AS b0,
      |    CAST(sum(CASE WHEN bit = 1 AND p >= 16 AND p < 32 THEN (CAST(1 AS BIGINT) << (31 - p)) ELSE 0 END) AS BIGINT) AS b1,
      |    CAST(sum(CASE WHEN bit = 1 AND p >= 32 AND p < 48 THEN (CAST(1 AS BIGINT) << (47 - p)) ELSE 0 END) AS BIGINT) AS b2,
      |    CAST(sum(CASE WHEN bit = 1 AND p >= 48 THEN (CAST(1 AS BIGINT) << (63 - p)) ELSE 0 END) AS BIGINT) AS b3,
      |    CAST(sum(CASE WHEN bit = 1 AND p < 32 THEN (CAST(1 AS BIGINT) << (31 - p)) ELSE 0 END) AS BIGINT) AS hi,
      |    CAST(sum(CASE WHEN bit = 1 AND p >= 32 THEN (CAST(1 AS BIGINT) << (63 - p)) ELSE 0 END) AS BIGINT) AS lo
      |  FROM mbits GROUP BY img_id
      |), mcand AS (
      |  SELECT a.img_id AS a_id, b.img_id AS b_id
      |  FROM mh a JOIN mh b ON a.b0 = b.b0 AND a.img_id < b.img_id
      |  UNION SELECT a.img_id, b.img_id
      |  FROM mh a JOIN mh b ON a.b1 = b.b1 AND a.img_id < b.img_id
      |  UNION SELECT a.img_id, b.img_id
      |  FROM mh a JOIN mh b ON a.b2 = b.b2 AND a.img_id < b.img_id
      |  UNION SELECT a.img_id, b.img_id
      |  FROM mh a JOIN mh b ON a.b3 = b.b3 AND a.img_id < b.img_id
      |), mdrop AS (
      |  SELECT DISTINCT c.b_id FROM mcand c
      |  JOIN mh ha ON ha.img_id = c.a_id
      |  JOIN mh hb ON hb.img_id = c.b_id
      |  WHERE bit_count(xor(ha.hi, hb.hi)) + bit_count(xor(ha.lo, hb.lo)) <= 3
      |), msurv AS (
      |  SELECT d.doc_id, d.source, d.img_j, d.img_id, d.w, d.h,
      |    h.hi AS ahash_hi, h.lo AS ahash_lo
      |  FROM mdim d JOIN mh h USING (img_id)
      |  WHERE d.img_id NOT IN (SELECT b_id FROM mdrop)
      |), mcap AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY source
      |    ORDER BY md5(CAST(ahash_hi AS VARCHAR) || '_' || CAST(ahash_lo AS VARCHAR)),
      |      img_id) AS rn_cap
      |  FROM msurv
      |)""".stripMargin

  /** The shared audio-route CTEs for x154/x155: ALL audio records with
    * the WAV byte-size closed form (`auprm` — exactly 44 + 2n bytes),
    * the decode-gate survivors (`audec` — the every-7th-doc corruption
    * plant excluded), the per-sample re-fold of every decoded statistic
    * from the congruence closed form (`aufeat` — sum_sq/sum_abs/peak
    * plus the lag-window zero-cross count, quiet plant on the mod-251
    * branch), the quality screen (`auscr` — duration ≥ 50 ms AND
    * rms ≥ 500), the exact-fingerprint dedup (`audd` — keep-min aud_id
    * per decoded statistic vector), and the per-source cap window
    * (`aucap` — md5 of the same '_'-joined fingerprint string Spark
    * hashes).
    */
  protected lazy val mediaAudioCtesSql: String =
    s"""au0 AS (
      |  SELECT doc_id, source, unnest(range(1 + doc_id % 2)) AS j
      |  FROM documents
      |), aual AS (
      |  SELECT doc_id, source, CAST(j AS INTEGER) AS aud_j,
      |    doc_id * 2 + j AS aud_id, (doc_id // 2) * 2 + j AS pid
      |  FROM au0
      |), auprm AS MATERIALIZED (
      |  SELECT *, CAST(300 + pid % 7 * 100 AS INTEGER) AS n,
      |    pid % 5 = 4 AS quiet,
      |    CAST(44 + 2 * (300 + pid % 7 * 100) AS BIGINT) AS n_bytes
      |  FROM aual
      |), audec AS MATERIALIZED (
      |  SELECT * FROM auprm WHERE doc_id % 7 <> 0
      |), ausmp AS (
      |  SELECT aud_id, pid, quiet, unnest(range(n)) AS i FROM audec
      |), auval AS (
      |  SELECT aud_id, i,
      |    CASE WHEN quiet THEN (pid * 7919 + i * 2657) % 251 - 125
      |         ELSE (pid * 7919 + i * 2657) % 4001 - 2000 END AS s
      |  FROM ausmp
      |), aulag AS (
      |  SELECT aud_id, s,
      |    lag(s) OVER (PARTITION BY aud_id ORDER BY i) AS ps
      |  FROM auval
      |), aufeat AS MATERIALIZED (
      |  SELECT aud_id,
      |    CAST(sum(s * s) AS BIGINT) AS sum_sq,
      |    CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
      |    CAST(max(abs(s)) AS INTEGER) AS peak,
      |    CAST(sum(CASE WHEN ps IS NOT NULL AND ((s < 0) <> (ps < 0))
      |                  THEN 1 ELSE 0 END) AS INTEGER) AS zero_cross
      |  FROM aulag GROUP BY aud_id
      |), aurows AS MATERIALIZED (
      |  SELECT d.doc_id, d.source, d.aud_j, d.aud_id, d.n_bytes,
      |    d.n AS n_samples,
      |    CAST(8000 AS INTEGER) AS sample_rate,
      |    CAST(d.n * 1000 // 8000 AS BIGINT) AS duration_ms,
      |    f.sum_sq, f.sum_abs, f.peak, f.zero_cross
      |  FROM audec d JOIN aufeat f USING (aud_id)
      |), auscr AS (
      |  SELECT * FROM aurows
      |  WHERE duration_ms >= 50
      |    AND sum_sq >= CAST(n_samples AS BIGINT) * 250000
      |), audd AS MATERIALIZED (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY n_samples, sum_sq, sum_abs, peak, zero_cross
      |      ORDER BY aud_id) AS rn_dd
      |    FROM auscr)
      |  WHERE rn_dd = 1
      |), aucap AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY source
      |    ORDER BY md5(CAST(sum_sq AS VARCHAR) || '_' ||
      |      CAST(sum_abs AS VARCHAR) || '_' ||
      |      CAST(peak AS VARCHAR) || '_' ||
      |      CAST(zero_cross AS VARCHAR) || '_' ||
      |      CAST(n_samples AS VARCHAR)), aud_id) AS rn_cap
      |  FROM audd
      |)""".stripMargin

  /** The x154 audio-route oracle: the audio CTEs' capped survivors. */
  protected lazy val audioRouteSql: String =
    s"""WITH $mediaAudioCtesSql
      |SELECT doc_id, source, aud_j, aud_id, n_samples, sample_rate,
      |  duration_ms, sum_sq, sum_abs, peak, zero_cross
      |FROM aucap WHERE rn_cap <= 10
      |ORDER BY doc_id, aud_id""".stripMargin

  /** The x155 audio-funnel oracle: the audio CTEs aggregated per stage
    * — aud_records over ALL records (bytes from the 44+2n closed form,
    * samples 0 before decode), then decoded / screened / audio_dedup /
    * audio_capped with their byte + sample mass.
    */
  protected lazy val audioFunnelSql: String = {
    def agg(idx: Int, name: String, src: String, smp: String): String =
      s"""SELECT CAST($idx AS BIGINT) AS stage_idx, '$name' AS stage,
         |  CAST(count(*) AS BIGINT) AS n_audio,
         |  CAST(coalesce(sum(n_bytes), 0) AS BIGINT) AS n_bytes,
         |  CAST(coalesce(sum($smp), 0) AS BIGINT) AS n_samples
         |FROM $src""".stripMargin
    s"""WITH $mediaAudioCtesSql
      |${agg(1, "aud_records", "auprm", "0")}
      |UNION ALL ${agg(2, "decoded", "aurows", "n_samples")}
      |UNION ALL ${agg(3, "screened", "auscr", "n_samples")}
      |UNION ALL ${agg(4, "audio_dedup", "audd", "n_samples")}
      |UNION ALL ${agg(5, "audio_capped",
        "(SELECT * FROM aucap WHERE rn_cap <= 10)", "n_samples")}
      |ORDER BY stage_idx""".stripMargin
  }

  /** The shared video-route CTEs for x156/x157: ALL video records with
    * the AVI byte-size closed form (`vprm` — 224 + 32·frames), the
    * decode-gate survivors (`vdec`), every SAMPLED frame's position-
    * weighted checksum recomputed from the payload congruence (`vcs` —
    * stride-2 frame indices, 24 payload bytes each), the in-order
    * checksum-sequence signature (`vsig` — string_agg ordered by frame,
    * matching Spark's array_join over the decode-ordered array), the
    * too-few-frames screen (`vscr`), the signature dedup (`vdd`), and
    * the per-source cap window (`vcap`).
    */
  protected lazy val mediaVideoCtesSql: String =
    s"""vv0 AS (
      |  SELECT doc_id, source, unnest(range(1 + doc_id % 2)) AS j
      |  FROM documents
      |), vval AS (
      |  SELECT doc_id, source, CAST(j AS INTEGER) AS vid_j,
      |    doc_id * 2 + j AS vid_id, (doc_id // 2) * 2 + j AS pid
      |  FROM vv0
      |), vprm AS MATERIALIZED (
      |  SELECT *, 8 + pid % 23 AS w, 8 + pid % 19 AS h,
      |    CAST(2 + pid % 9 AS INTEGER) AS fr,
      |    CAST(224 + 32 * (2 + pid % 9) AS BIGINT) AS n_bytes,
      |    CAST((2 + pid % 9 + 1) // 2 AS INTEGER) AS n_sampled
      |  FROM vval
      |), vdec AS MATERIALIZED (
      |  SELECT * FROM vprm WHERE doc_id % 7 <> 0
      |), vfr AS (
      |  SELECT vid_id, pid, w, h, unnest(range(0, fr, 2)) AS f FROM vdec
      |), vby AS (
      |  SELECT vid_id, pid, w, h, f, unnest(range(24)) AS i FROM vfr
      |), vcs AS (
      |  SELECT vid_id, f,
      |    sum(((pid * 41 + w * 31 + h * 17 + f * 7 + i * 13) % 256) * (i + 1)) AS cs
      |  FROM vby GROUP BY 1, 2
      |), vsig AS MATERIALIZED (
      |  SELECT vid_id,
      |    string_agg(CAST(cs AS VARCHAR), '_' ORDER BY f) AS sig
      |  FROM vcs GROUP BY vid_id
      |), vrows AS MATERIALIZED (
      |  SELECT d.doc_id, d.source, d.vid_j, d.vid_id, d.n_bytes,
      |    d.n_sampled, s.sig
      |  FROM vdec d JOIN vsig s USING (vid_id)
      |), vscr AS (
      |  SELECT * FROM vrows WHERE n_sampled >= 2
      |), vdd AS MATERIALIZED (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY sig ORDER BY vid_id) AS rn_dd
      |    FROM vscr)
      |  WHERE rn_dd = 1
      |), vcap AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY source ORDER BY md5(sig), vid_id) AS rn_cap
      |  FROM vdd
      |)""".stripMargin

  /** The x156 video-route oracle: the video CTEs' capped survivors. */
  protected lazy val videoRouteSql: String =
    s"""WITH $mediaVideoCtesSql
      |SELECT doc_id, source, vid_j, vid_id, n_bytes, n_sampled, sig
      |FROM vcap WHERE rn_cap <= 10
      |ORDER BY doc_id, vid_id""".stripMargin

  /** The x157 video-funnel oracle: the video CTEs aggregated per stage
    * (the x155 shape on the fourth modality).
    */
  protected lazy val videoFunnelSql: String = {
    def agg(idx: Int, name: String, src: String, smp: String): String =
      s"""SELECT CAST($idx AS BIGINT) AS stage_idx, '$name' AS stage,
         |  CAST(count(*) AS BIGINT) AS n_videos,
         |  CAST(coalesce(sum(n_bytes), 0) AS BIGINT) AS n_bytes,
         |  CAST(coalesce(sum($smp), 0) AS BIGINT) AS n_sampled
         |FROM $src""".stripMargin
    s"""WITH $mediaVideoCtesSql
      |${agg(1, "vid_records", "vprm", "0")}
      |UNION ALL ${agg(2, "decoded", "vrows", "n_sampled")}
      |UNION ALL ${agg(3, "screened", "vscr", "n_sampled")}
      |UNION ALL ${agg(4, "video_dedup", "vdd", "n_sampled")}
      |UNION ALL ${agg(5, "video_capped",
        "(SELECT * FROM vcap WHERE rn_cap <= 10)", "n_sampled")}
      |ORDER BY stage_idx""".stripMargin
  }

  /** The shared mixed-container BYTE-LAYOUT CTEs (`d` → `vsized` plus
    * the per-modality end markers): every record's header string built
    * in SQL and strlen'd, every payload size from its closed form (HTML
    * strlen; BMP stride/padding; GIF header + color table + LZW stream;
    * WAV 44+2n; AVI 224+32·frames), parameterized by the doc-subset
    * predicate so the CDX surface (x153, doc_id%5=1) and the census
    * surface (x158, doc_id%5=2) derive from ONE layout definition but
    * different documents — a drift in either cannot mask the other.
    * Pre-stripped: interpolate with plain concatenation, NOT inside
    * another stripMargin (continuation lines start with `||`).
    */
  protected def mediaContainerSizedCtesSql(pred: String): String =
    s"""d AS (
      |  SELECT doc_id, text, CAST(doc_id AS VARCHAR) AS ids,
      |    1 + doc_id % 3 AS nrec, 1 + doc_id % 2 AS nimg
      |  FROM documents WHERE $pred
      |), h AS (
      |  SELECT *,
      |    '<!DOCTYPE html>' || chr(10) || '<html>' || chr(10) || '<head>' || chr(10)
      |    || '<title>Doc ' || ids || '</title>' || chr(10)
      |    || '<meta charset="utf-8">' || chr(10)
      |    || '<script type="text/javascript">var n = ' || ids
      |    || '; if (n < 100) { document.x = "<p>not text</p>"; }</script>' || chr(10)
      |    || '<style>.m' || (doc_id % 7) || ' { color: #fff; }</style>' || chr(10)
      |    || '</head>' || chr(10) || '<body>' || chr(10) || '<nav><ul>' || chr(10)
      |    || '<li><a href="/p/' || ids || '">nav item ' || ids || '</a></li>' || chr(10)
      |    || '<li><a href="/q/' || (doc_id % 13) || '">more links here</a></li>' || chr(10)
      |    || '</ul></nav>' || chr(10)
      |    || '<!-- boilerplate ends <p>ghost paragraph</p> -->' || chr(10)
      |    || '<div class="main">' || chr(10)
      |    || '<h1>Heading ' || ids || '&#33;</h1>' || chr(10)
      |    || '<p>' || replace(replace(replace(text, '&', '&amp;'),
      |                                '<', '&lt;'), '>', '&gt;')
      |    || ' see <a href="/ref/' || ids || '">ref ' || ids || '</a></p>' || chr(10)
      |    || '</div>' || chr(10)
      |    || '<footer><a href="/about">about</a> &amp; <a href="/tos">terms</a></footer>' || chr(10)
      |    || '</body>' || chr(10) || '</html>' || chr(10) AS html
      |  FROM d
      |), sz AS (
      |  SELECT doc_id, ids, nrec, nimg, strlen(html) AS clen,
      |    strlen('WARC/1.0' || e'\r\n'
      |      || 'WARC-Type: warcinfo' || e'\r\n'
      |      || 'WARC-Record-ID: <urn:graft:' || ids || ':info>' || e'\r\n'
      |      || 'WARC-Date: 2020-01-01T00:00:00Z' || e'\r\n'
      |      || 'Content-Type: application/warc-fields' || e'\r\n'
      |      || 'Content-Length: 17' || e'\r\n' || e'\r\n') + 17 + 4 AS isize
      |  FROM h
      |), trecs AS (
      |  SELECT doc_id, ids, clen, isize, nimg, unnest(range(nrec)) AS i FROM sz
      |), tsized AS (
      |  SELECT *,
      |    strlen('WARC/1.0' || e'\r\n'
      |      || 'WARC-Type: resource' || e'\r\n'
      |      || 'WARC-Record-ID: <urn:graft:' || ids || ':' || i || '>' || e'\r\n'
      |      || 'WARC-Target-URI: http://example.com/doc/' || ids || '/' || i || e'\r\n'
      |      || 'WARC-Date: 2020-01-01T00:00:0' || i || 'Z' || e'\r\n'
      |      || 'Content-Type: text/html' || e'\r\n'
      |      || 'Content-Length: ' || clen || e'\r\n' || e'\r\n') + clen + 4 AS rsize
      |  FROM trecs
      |), ttot AS (
      |  SELECT doc_id, any_value(isize) + sum(rsize) AS text_end
      |  FROM tsized GROUP BY doc_id
      |), irecs AS (
      |  SELECT s.doc_id, s.ids, t.text_end, unnest(range(s.nimg)) AS j
      |  FROM sz s JOIN ttot t USING (doc_id)
      |), imeta AS (
      |  SELECT *, (doc_id // 2) * 2 + j AS pid,
      |    CASE WHEN (doc_id + j) % 2 = 1 THEN 'gif' ELSE 'bmp' END AS ext
      |  FROM irecs
      |), idim AS (
      |  SELECT *, 16 + pid % 16 AS w, 16 + pid % 12 AS h FROM imeta
      |), ipsz0 AS (
      |  SELECT *, CAST(w AS BIGINT) * h AS npx FROM idim
      |), ipsz1 AS (
      |  SELECT *, (9 * (npx + 2 + (npx - 1) // 253) + 7) // 8 AS nb FROM ipsz0
      |), ipsz AS (
      |  SELECT *, CASE WHEN ext = 'gif'
      |      THEN 792 + nb + (nb + 254) // 255 + 2
      |      ELSE 54 + ((3 * w + 3) // 4) * 4 * h END AS psize
      |  FROM ipsz1
      |), isized AS (
      |  SELECT *,
      |    strlen('WARC/1.0' || e'\r\n'
      |      || 'WARC-Type: resource' || e'\r\n'
      |      || 'WARC-Record-ID: <urn:graft:' || ids || ':img:' || j || '>' || e'\r\n'
      |      || 'WARC-Target-URI: http://example.com/img/' || ids || '/' || j || '.' || ext || e'\r\n'
      |      || 'WARC-Date: 2020-01-01T00:00:1' || j || 'Z' || e'\r\n'
      |      || 'Content-Type: image/' || ext || e'\r\n'
      |      || 'Content-Length: ' || psize || e'\r\n' || e'\r\n') + psize + 4 AS rsize
      |  FROM ipsz
      |), itot AS (
      |  SELECT doc_id, any_value(text_end) + sum(rsize) AS img_end
      |  FROM isized GROUP BY doc_id
      |), arecs AS (
      |  SELECT s.doc_id, s.ids, t.img_end, unnest(range(s.nimg)) AS k
      |  FROM sz s JOIN itot t USING (doc_id)
      |), apsz AS (
      |  SELECT *, 44 + 2 * (300 + ((doc_id // 2) * 2 + k) % 7 * 100) AS psize
      |  FROM arecs
      |), asized AS (
      |  SELECT *,
      |    strlen('WARC/1.0' || e'\r\n'
      |      || 'WARC-Type: resource' || e'\r\n'
      |      || 'WARC-Record-ID: <urn:graft:' || ids || ':aud:' || k || '>' || e'\r\n'
      |      || 'WARC-Target-URI: http://example.com/aud/' || ids || '/' || k || '.wav' || e'\r\n'
      |      || 'WARC-Date: 2020-01-01T00:00:2' || k || 'Z' || e'\r\n'
      |      || 'Content-Type: audio/wav' || e'\r\n'
      |      || 'Content-Length: ' || psize || e'\r\n' || e'\r\n') + psize + 4 AS rsize
      |  FROM apsz
      |), atot AS (
      |  SELECT doc_id, any_value(img_end) + sum(rsize) AS aud_end
      |  FROM asized GROUP BY doc_id
      |), vrecs AS (
      |  SELECT s.doc_id, s.ids, t.aud_end, unnest(range(s.nimg)) AS v
      |  FROM sz s JOIN atot t USING (doc_id)
      |), vpsz AS (
      |  SELECT *, 224 + 32 * (2 + ((doc_id // 2) * 2 + v) % 9) AS psize
      |  FROM vrecs
      |), vsized AS (
      |  SELECT *,
      |    strlen('WARC/1.0' || e'\r\n'
      |      || 'WARC-Type: resource' || e'\r\n'
      |      || 'WARC-Record-ID: <urn:graft:' || ids || ':vid:' || v || '>' || e'\r\n'
      |      || 'WARC-Target-URI: http://example.com/vid/' || ids || '/' || v || '.avi' || e'\r\n'
      |      || 'WARC-Date: 2020-01-01T00:00:3' || v || 'Z' || e'\r\n'
      |      || 'Content-Type: video/avi' || e'\r\n'
      |      || 'Content-Length: ' || psize || e'\r\n' || e'\r\n') + psize + 4 AS rsize
      |  FROM vpsz
      |), vtot AS (
      |  SELECT doc_id, any_value(aud_end) + sum(rsize) AS file_end
      |  FROM vsized GROUP BY doc_id
      |)""".stripMargin

  /** The x158 container-census oracle: the sized CTEs (doc_id%5=2)
    * aggregated per modality — record count, payload-byte mass, full
    * record-span mass — plus the whole-container row, whose byte total
    * MUST equal the sum of the modality spans (the records tile each
    * file exactly; any mis-slice breaks a modality's sum).
    */
  protected lazy val containerCensusSql: String =
    "WITH " + mediaContainerSizedCtesSql("doc_id % 5 = 2") + "\n" +
      """SELECT rec_kind, CAST(n_records AS BIGINT) AS n_records,
        |  CAST(payload_bytes AS BIGINT) AS payload_bytes,
        |  CAST(record_bytes AS BIGINT) AS record_bytes
        |FROM (
        |  SELECT 'container' AS rec_kind, count(*) AS n_records,
        |    sum(file_end) AS payload_bytes, sum(file_end) AS record_bytes
        |  FROM vtot
        |  UNION ALL
        |  SELECT 'warcinfo', count(*), sum(17), sum(isize) FROM sz
        |  UNION ALL
        |  SELECT 'page', count(*), sum(clen), sum(rsize) FROM tsized
        |  UNION ALL
        |  SELECT 'image', count(*), sum(psize), sum(rsize) FROM isized
        |  UNION ALL
        |  SELECT 'audio', count(*), sum(psize), sum(rsize) FROM asized
        |  UNION ALL
        |  SELECT 'video', count(*), sum(psize), sum(rsize) FROM vsized
        |)
        |ORDER BY rec_kind""".stripMargin

  /** The x150 multimodal-arc oracle: the x146 text chain verbatim
    * (the mixed container embeds the SAME text records, so `afin` is
    * the curated-page set), plus the image half replayed closed-form —
    * image j of doc d has pixel seed pid = (d div 2)·2+j and dims
    * (16+pid%16) × (16+pid%12); every 7th doc's images are corruption-
    * planted (dropped here by construction, on the Spark side by the
    * decode gate); aHash from the shared pixel formula (the x29 CTEs);
    * Hamming ≤ 3 near-dup over 4×16-bit band candidates (the x30 CTEs;
    * banding only GENERATES candidates, so band choice cancels);
    * greedy keep-first (any verified pair drops the larger img_id);
    * per-source cap in (md5(hi_lo), img_id) order; fused by inner join
    * to the curated page of the same doc.
    */
  protected lazy val webArcMediaSql: String =
    s"""WITH RECURSIVE $webArcChainSql, $mediaImageCtesSql
      |SELECT i.source, i.doc_id, f.page_id, f.lang_pred, f.n_tokens,
      |  i.img_id, i.img_j, i.w, i.h, i.ahash_hi, i.ahash_lo
      |FROM mcap i JOIN afin f ON f.doc_id = i.doc_id
      |WHERE i.rn_cap <= 10
      |ORDER BY i.doc_id, i.img_id""".stripMargin

  /** The x152 media-funnel oracle: the image CTEs aggregated per stage
    * — img_records over ALL records (bytes from the layout closed
    * forms, pixels 0 before decode), then the valid / near-dup-survivor
    * / capped sets joined back to `msz` for their byte+pixel mass.
    */
  protected lazy val mediaFunnelSql: String = {
    def agg(idx: Int, name: String, src: String, px: String): String =
      s"""SELECT CAST($idx AS BIGINT) AS stage_idx, '$name' AS stage,
         |  CAST(count(*) AS BIGINT) AS n_images,
         |  CAST(coalesce(sum(n_bytes), 0) AS BIGINT) AS n_bytes,
         |  CAST(coalesce(sum($px), 0) AS BIGINT) AS n_px
         |FROM $src""".stripMargin
    s"""WITH $mediaImageCtesSql
      |${agg(1, "img_records", "msz", "0")}
      |UNION ALL ${agg(2, "decoded", "(SELECT * FROM msz WHERE doc_id % 7 <> 0)", "npx")}
      |UNION ALL ${agg(3, "image_neardup",
        "(SELECT z.* FROM msz z JOIN msurv s USING (img_id))", "npx")}
      |UNION ALL ${agg(4, "image_capped",
        "(SELECT z.* FROM msz z JOIN mcap c USING (img_id) WHERE c.rn_cap <= 10)", "npx")}
      |ORDER BY stage_idx""".stripMargin
  }

  /** Shared DuckDB replay for x131/x132: the three one-vs-all training
    * chains (one [[perceptronCtesSql]] call per class, prefixed c{c}_,
    * over the shared label-independent `ftfb` at dim 128), one final
    * scoring pass per class, and the strict smallest-index argmax —
    * yields `pr` (doc_id, score0..2, pred_cls). ONE helper so the
    * train-infer and eval oracles cannot drift.
    */
  protected lazy val ovaCtesSql: String = {
    val chains = (0 until 3).map { c =>
      perceptronCtesSql(
        rounds = 2, dim = 128,
        labelSql = s"CASE WHEN doc_id % 3 = $c THEN CAST(1 AS BIGINT) " +
          "ELSE CAST(-1 AS BIGINT) END",
        pfx = s"c${c}_")
    }.mkString(", ")
    val finals = (0 until 3).map { c =>
      s"""s$c AS (
         |  SELECT fc.doc_id, sum(fc.cnt * w.w) AS score
         |  FROM c0_fc fc JOIN c${c}_w2 w ON w.b = fc.b GROUP BY 1
         |)""".stripMargin
    }.mkString(", ")
    s"""${ftFeatureCtes(128)}, $chains, $finals, pr AS (
       |  SELECT s0.doc_id,
       |    CAST(s0.score AS BIGINT) AS score0,
       |    CAST(s1.score AS BIGINT) AS score1,
       |    CAST(s2.score AS BIGINT) AS score2,
       |    CASE WHEN s0.score >= s1.score AND s0.score >= s2.score THEN CAST(0 AS BIGINT)
       |         WHEN s1.score >= s2.score THEN CAST(1 AS BIGINT)
       |         ELSE CAST(2 AS BIGINT) END AS pred_cls
       |  FROM s0 JOIN s1 USING (doc_id) JOIN s2 USING (doc_id)
       |)""".stripMargin
  }

  /** One unrolled synchronous LPA round for the x77 oracle: neighbor-label
    * plurality count, then a (count desc, label asc) row_number argmax —
    * the same total order the operator's min(struct(−cnt, label)) encodes.
    */
  /** One unrolled fixed-point matrix SQUARING for the x137 oracle:
    * Mᵣ = (Mᵣ₋₁·Mᵣ₋₁) div max(max|·| div 10⁸, 1) — the exact
    * [[graft.operators.Pca.powerIterate]] squaring (64³ product rows
    * per round, dim²-bounded result). Expects `m${i-1}`; yields `m$i`.
    */
  protected def pcaSquareSql(i: Int, pfx: String = "m", sqPfx: String = "sq"): String = {
    val prev = s"$pfx${i - 1}"
    s"""$sqPfx$i AS MATERIALIZED (
       |  SELECT a.i, b.j, sum(a.c * b.c) AS c
       |  FROM $prev a JOIN $prev b ON a.j = b.i GROUP BY 1, 2
       |), $pfx$i AS MATERIALIZED (
       |  SELECT i, j, CAST(c // (SELECT greatest(max(abs(c)) // 100000000, 1)
       |                          FROM $sqPfx$i) AS BIGINT) AS c
       |  FROM $sqPfx$i
       |)""".stripMargin
  }

  /** Shared x137/x143 moment CTEs: quantization (the vq convention),
    * one-pass integer moments over the % 2 training half, and the
    * n²-scaled covariance `c0` — generated once so the projection and
    * reduction replays cannot drift.
    */
  protected lazy val pcaMomentsCtesSql: String =
    """vq AS MATERIALIZED (
      |  SELECT vec_id,
      |    [CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) for x in
      |       embedding] AS q
      |  FROM embeddings
      |), mom AS MATERIALIZED (
      |  SELECT di.i AS i, dj.j AS j, sum(q[di.i + 1] * q[dj.j + 1]) AS g
      |  FROM vq, range(0, 64) di(i), range(0, 64) dj(j)
      |  WHERE vec_id % 2 = 0
      |  GROUP BY 1, 2
      |), sv AS MATERIALIZED (
      |  SELECT di.i AS i, sum(q[di.i + 1]) AS s, count(*) AS n
      |  FROM vq, range(0, 64) di(i)
      |  WHERE vec_id % 2 = 0
      |  GROUP BY 1
      |), c0 AS MATERIALIZED (
      |  SELECT m.i, m.j, CAST(si.n * m.g - si.s * sj.s AS BIGINT) AS c
      |  FROM mom m JOIN sv si ON si.i = m.i JOIN sv sj ON sj.i = m.j
      |)""".stripMargin

  /** One component of the x143 deflation chain: rescale the chain
    * matrix `cc$k`, ten squarings, the component `xf$k`, and (below the
    * last component) the integer Hotelling deflation producing
    * `cc${k+1}` — the exact [[graft.operators.Pca.topComponents]] loop,
    * with the >2⁶³ intermediates on HUGEINT (mirroring Scala BigInt,
    * identical trunc-toward-zero `//`).
    */
  protected def pcaComponentSql(k: Int, last: Boolean): String = {
    val pfx = s"m${k}_"
    val solve =
      s"""${pfx}0 AS MATERIALIZED (
         |  SELECT i, j, c // (SELECT greatest(max(abs(c)) // 100000000, 1)
         |                     FROM cc$k) AS c
         |  FROM cc$k
         |), ${(1 to 10).map(i => pcaSquareSql(i, pfx, s"sq${k}_")).mkString(", ")}, yv$k AS MATERIALIZED (
         |  SELECT i AS d, sum(c) AS y FROM ${pfx}10 GROUP BY 1
         |), xf$k AS MATERIALIZED (
         |  SELECT d, CAST(y // (SELECT greatest(max(abs(y)) // 1000000, 1)
         |                       FROM yv$k) AS BIGINT) AS w
         |  FROM yv$k
         |)""".stripMargin
    if (last) solve
    else
      solve + s""", xtx$k AS (
         |  SELECT greatest(sum(CAST(w AS HUGEINT) * w), 1) AS v FROM xf$k
         |), xcx$k AS (
         |  SELECT sum(CAST(c.c AS HUGEINT) * xi.w * xj.w) AS v
         |  FROM cc$k c JOIN xf$k xi ON xi.d = c.i JOIN xf$k xj ON xj.d = c.j
         |), cc${k + 1} AS MATERIALIZED (
         |  SELECT c.i, c.j, CAST(c.c -
         |    (CAST((SELECT v FROM xcx$k) // (SELECT v FROM xtx$k) AS HUGEINT)
         |       * xi.w * xj.w) // (SELECT v FROM xtx$k) AS BIGINT) AS c
         |  FROM cc$k c JOIN xf$k xi ON xi.d = c.i JOIN xf$k xj ON xj.d = c.j
         |)""".stripMargin
  }

  /** Shared DuckDB replay CTEs for the Bradley-Terry family (x136,
    * x141): the comparison log planted from (doc, doc+1) n_chars duels,
    * per-pair/per-item reductions, then all four MM rounds unrolled
    * ([[btRoundSql]]) in BIGINT fixed-point. ONE generator so the
    * rating and pair-curation replays cannot drift. Yields CTEs
    * `bt_cmp` (cmp_id, item_a, item_b, winner), `bt_pairs`, `bt_stats`,
    * and `r0`..`r4`. CTEs referenced more than once are MATERIALIZED —
    * DuckDB inlines otherwise, and the doubly-referenced round chain
    * expands exponentially.
    */
  protected lazy val btCtesSql: String =
    s"""bt_cmp AS MATERIALIZED (
      |  SELECT d1.doc_id AS cmp_id,
      |    d1.doc_id % 64 AS item_a, d2.doc_id % 64 AS item_b,
      |    CASE WHEN d1.n_chars > d2.n_chars THEN d1.doc_id % 64
      |         WHEN d2.n_chars > d1.n_chars THEN d2.doc_id % 64
      |         ELSE least(d1.doc_id % 64, d2.doc_id % 64) END AS winner
      |  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
      |  WHERE d1.doc_id % 64 <> d2.doc_id % 64
      |), bt_pairs AS MATERIALIZED (
      |  SELECT least(item_a, item_b) AS i, greatest(item_a, item_b) AS j,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM bt_cmp GROUP BY 1, 2
      |), bt_wins AS (
      |  SELECT winner AS item, CAST(count(*) AS BIGINT) AS wins
      |  FROM bt_cmp GROUP BY 1
      |), bt_deg AS (
      |  SELECT item, CAST(sum(n) AS BIGINT) AS n_comps FROM (
      |    SELECT i AS item, n FROM bt_pairs
      |    UNION ALL SELECT j AS item, n FROM bt_pairs)
      |  GROUP BY item
      |), bt_stats AS MATERIALIZED (
      |  SELECT d.item, d.n_comps, coalesce(w.wins, CAST(0 AS BIGINT)) AS wins
      |  FROM bt_deg d LEFT JOIN bt_wins w USING (item)
      |), r0 AS MATERIALIZED (
      |  SELECT item, CAST(1000000 AS BIGINT) AS w FROM bt_stats
      |), ${(1 to 4).map(btRoundSql).mkString(", ")}""".stripMargin

  /** One unrolled Bradley-Terry MM round for the x136 oracle: the exact
    * [[graft.operators.Preference.btRatings]] fixed-point arithmetic —
    * t_ij = n·S² div max(w_i+w_j, 1), denom as both orientations summed,
    * raw = wins·S² div max(denom, 1), then max-normalization
    * raw div max(max_raw div S, 1). Expects CTEs `bt_pairs`, `bt_stats`,
    * and `r${i-1}`; yields `r$i`.
    */
  protected def btRoundSql(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""t$i AS MATERIALIZED (
       |  SELECT p.i, p.j,
       |    p.n * CAST(1000000000000 AS BIGINT) // greatest(wi.w + wj.w, 1) AS t
       |  FROM bt_pairs p
       |  JOIN $prev wi ON wi.item = p.i JOIN $prev wj ON wj.item = p.j
       |), d$i AS (
       |  SELECT item, sum(t) AS denom FROM (
       |    SELECT i AS item, t FROM t$i UNION ALL SELECT j AS item, t FROM t$i)
       |  GROUP BY item
       |), raw$i AS MATERIALIZED (
       |  SELECT s.item,
       |    s.wins * CAST(1000000000000 AS BIGINT)
       |      // greatest(coalesce(d.denom, 0), 1) AS w_raw
       |  FROM bt_stats s LEFT JOIN d$i d USING (item)
       |), r$i AS MATERIALIZED (
       |  SELECT item,
       |    w_raw // greatest((SELECT max(w_raw) FROM raw$i) // 1000000, 1) AS w
       |  FROM raw$i
       |)""".stripMargin
  }

  protected lazy val learnedQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x125_fuzzy_clusters_d2" -> (x125 _),
    "x126_ft_classify" -> (x126 _),
    "x127_ft_curation" -> (x127 _),
    "x128_perceptron_train" -> (x128 _),
    "x129_perceptron_infer" -> (x129 _),
    "x130_ft_multiclass" -> (x130 _),
    "x131_ova_train_infer" -> (x131 _),
    "x132_eval_confusion" -> (x132 _),
    "x133_uncertain_docs" -> (x133 _),
    "x134_model_roundtrip" -> (x134 _),
    "x136_bt_rating" -> (x136 _),
    "x137_pca_project" -> (x137 _),
    "x138_calibration_bins" -> (x138 _),
    "x139_isotonic_calibration" -> (x139 _),
    "x140_corpus_report" -> (x140 _),
    "x141_preference_pairs" -> (x141 _),
    "x142_calibrated_screen" -> (x142 _),
    "x143_pca_reduce" -> (x143 _),
    "x144_reduced_recall" -> (x144 _),
    "x146_web_arc" -> (x146 _),
    "x149_arc_funnel" -> (x149 _),
    "x147_bt_distributed" -> (x147 _),
    "x148_explained_variance" -> (x148 _),
    "x150_multimodal_arc" -> (x150 _),
    "x151_robots_arc" -> (x151 _),
    "x152_media_funnel" -> (x152 _),
    "x153_media_cdx" -> (x153 _),
    "x154_audio_route" -> (x154 _),
    "x155_audio_funnel" -> (x155 _),
    "x156_video_route" -> (x156 _),
    "x157_video_funnel" -> (x157 _),
    "x158_container_census" -> (x158 _),
    "x159_pack_multimodal" -> (x159 _)
  )

  protected lazy val learnedOracles: Map[String, String] = Map(
    // x125: x56's transitive-closure replay one edit further out — the
    // d<=2 pair graph over p_name, threshold 2 in the same recursive CTE.
    "x125_fuzzy_clusters_d2" ->
      """WITH RECURSIVE v AS (
        |  SELECT DISTINCT p_name AS s FROM part
        |  WHERE p_name IS NOT NULL AND length(p_name) >= 2
        |), p AS (
        |  SELECT a.s AS a, b.s AS b FROM v a JOIN v b ON a.s < b.s
        |  WHERE levenshtein(a.s, b.s) <= 2
        |), bidir AS (
        |  SELECT a AS src, b AS dst FROM p
        |  UNION SELECT b AS src, a AS dst FROM p
        |), reach AS (
        |  SELECT src, dst FROM bidir
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN bidir e ON r.dst = e.src
        |)
        |SELECT src AS name, least(src, min(dst)) AS cluster_root
        |FROM reach GROUP BY src ORDER BY name""".stripMargin,
    // x126: the ENTIRE inference path replayed closed-form — planted
    // weight table from the md5 formula, unigram+bigram bag, hash40
    // bucketing, BIGINT dots, strict argmax, one exact-IEEE division for
    // the margin (the x91 replay discipline applied to model inference).
    "x126_ft_classify" ->
      s"""WITH $ftCtesSql
        |SELECT doc_id, n_feats, dot0, dot1,
        |  CASE WHEN dot1 > dot0 THEN CAST(1 AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS pred,
        |  CAST(dot1 - dot0 AS DOUBLE) / (1000.0 * greatest(n_feats, 1)) AS margin
        |FROM ftdots ORDER BY doc_id""".stripMargin,
    // x127: x120's composed-curation replay with the learned screen in
    // the quality slot — dedup-first is result-identical because pred is
    // a pure function of text (the screen-first equivalence argument);
    // language argmax, BPE-ish count, and md5-ordered cap verbatim from
    // the x120 oracle.
    "x127_ft_curation" ->
      s"""WITH $ftCtesSql, surv AS (
        |  SELECT doc_id, source, text,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents
        |), s1 AS (
        |  SELECT doc_id, source, text FROM surv WHERE rn = 1
        |), kept AS (
        |  SELECT s1.doc_id, s1.source, s1.text,
        |    string_split_regex(trim(s1.text), '\\s+') AS toks
        |  FROM s1 JOIN ftdots d USING (doc_id) WHERE d.dot1 > d.dot0
        |), sc AS (
        |  SELECT *,
        |    len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','a'], t))) AS s_en,
        |    len(list_filter(toks, t -> list_contains(['el','los','de','y','que','en','una'], t))) AS s_es,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS s_de,
        |    len(list_filter(toks, t -> list_contains(['le','les','des','et','est','une','dans'], t))) AS s_fr
        |  FROM kept
        |), lang AS (
        |  SELECT *, CASE
        |    WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        |    WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
        |    WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
        |    WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
        |    ELSE 'fr' END AS lang_pred
        |  FROM sc
        |), fin AS (
        |  SELECT * FROM lang WHERE lang_pred <> 'und'
        |), capd AS (
        |  SELECT source, doc_id, lang_pred,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens,
        |    row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
        |  FROM fin
        |)
        |SELECT source, doc_id, lang_pred, n_tokens
        |FROM capd WHERE rn <= 10 ORDER BY source, doc_id""".stripMargin,
    // x128: the ENTIRE training loop unrolled — feature counts, the
    // planted labels, round 1's everyone-misclassified bootstrap, each
    // round's integer scores / ≤0 rule / synchronous update — so the
    // final-weights hash certifies the training algorithm itself (the
    // x118 integer-Lloyd replay discipline applied to learning).
    "x128_perceptron_train" ->
      s"""WITH $ftCtesSql, ${perceptronCtesSql(rounds = 3, dim = 512)}
        |SELECT b, w FROM w3 ORDER BY b""".stripMargin,
    // x129: one more scoring pass under the unrolled final weights —
    // sign prediction + correctness vs the planted labels, certifying
    // the train → infer composition end to end.
    "x129_perceptron_infer" -> x129OracleSql,
    // x134: x129's oracle VERBATIM (the x124 reuse discipline) — the
    // round-trip through the at-rest model table must be invisible to
    // the scores, so the SAME SQL certifies save → load → serve.
    "x134_model_roundtrip" -> x129OracleSql,
    // x136: the comparison log planted from (doc, doc+1) n_chars duels,
    // per-pair/per-item reductions, then all four Bradley-Terry MM
    // rounds unrolled in BIGINT fixed-point (btRoundSql — the
    // perceptron/LPA unrolled-oracle discipline; every division integer,
    // max-normalized per round exactly like the operator).
    "x136_bt_rating" ->
      s"""WITH $btCtesSql
        |SELECT s.item, s.n_comps, s.wins, CAST(r4.w AS BIGINT) AS rating,
        |  CAST(row_number() OVER (ORDER BY r4.w DESC, s.item) AS BIGINT) AS rank
        |FROM bt_stats s JOIN r4 USING (item)
        |ORDER BY item""".stripMargin,
    // x147: x136's oracle VERBATIM (the x134 reuse discipline) — the
    // distributed MM formulation must be invisible to the fit.
    "x147_bt_distributed" ->
      s"""WITH $btCtesSql
        |SELECT s.item, s.n_comps, s.wins, CAST(r4.w AS BIGINT) AS rating,
        |  CAST(row_number() OVER (ORDER BY r4.w DESC, s.item) AS BIGINT) AS rank
        |FROM bt_stats s JOIN r4 USING (item)
        |ORDER BY item""".stripMargin,
    // x141: the fitted board turned back on its own log — per
    // comparison, both sides' r4 ratings, the signed margin, the
    // model-agreement flag, and the curation keep (margin ≥ 0.1·S).
    // Same generator chain as x136, so the two replays cannot drift.
    "x141_preference_pairs" ->
      s"""WITH $btCtesSql
        |SELECT c.cmp_id, c.winner AS chosen,
        |  CASE WHEN c.winner = c.item_a THEN c.item_b
        |       ELSE c.item_a END AS rejected,
        |  CAST(rw.w AS BIGINT) AS chosen_rating,
        |  CAST(rl.w AS BIGINT) AS rejected_rating,
        |  CAST(rw.w - rl.w AS BIGINT) AS margin,
        |  (rw.w - rl.w > 0) AS agree,
        |  (rw.w - rl.w >= 100000) AS kept
        |FROM bt_cmp c
        |JOIN r4 rw ON rw.item = c.winner
        |JOIN r4 rl ON rl.item =
        |  (CASE WHEN c.winner = c.item_a THEN c.item_b ELSE c.item_a END)
        |ORDER BY cmp_id""".stripMargin,
    // x137: quantization (the vq convention) → one-pass integer moments
    // over the % 2 training half → n²-scaled covariance (never divides)
    // → 10⁸ downscale → TEN unrolled matrix squarings (pcaSquareSql —
    // effective power 1024, the flat-spectrum lesson) → component =
    // M₁₀·1 renormalized → projection of EVERY vector. All arithmetic
    // BIGINT/HUGEINT with truncating //, so the replay is bit-for-bit.
    "x137_pca_project" ->
      s"""WITH $pcaMomentsCtesSql, m0 AS MATERIALIZED (
        |  SELECT i, j,
        |    c // (SELECT greatest(max(abs(c)) // 100000000, 1) FROM c0) AS c
        |  FROM c0
        |), ${(1 to 10).map(i => pcaSquareSql(i)).mkString(", ")}, yv AS MATERIALIZED (
        |  SELECT i AS d, sum(c) AS y FROM m10 GROUP BY 1
        |), xf AS MATERIALIZED (
        |  SELECT d, CAST(y // (SELECT greatest(max(abs(y)) // 1000000, 1)
        |                       FROM yv) AS BIGINT) AS w
        |  FROM yv
        |)
        |SELECT v.vec_id, CAST(sum(v.q[x.d + 1] * x.w) AS BIGINT) AS proj
        |FROM vq v, xf x GROUP BY v.vec_id ORDER BY v.vec_id""".stripMargin,
    // x143: the top-4 reduction — the c0 chain rescaled once (cc0),
    // then per component: solve (pcaComponentSql) and integer Hotelling
    // deflation into cc{k+1}; per-component projections joined on
    // vec_id. Scala BigInt ≡ HUGEINT on the >2⁶³ intermediates.
    "x143_pca_reduce" ->
      s"""WITH $pcaMomentsCtesSql, cc0 AS MATERIALIZED (
        |  SELECT i, j,
        |    c // (SELECT greatest(max(abs(c)) // 100000000, 1) FROM c0) AS c
        |  FROM c0
        |), ${(0 until 4).map(k => pcaComponentSql(k, last = k == 3)).mkString(", ")},
        |${(0 until 4).map(k =>
             s"""pr$k AS MATERIALIZED (
             |  SELECT v.vec_id, CAST(sum(v.q[x.d + 1] * x.w) AS BIGINT) AS p${k + 1}
             |  FROM vq v, xf$k x GROUP BY 1
             |)""".stripMargin).mkString(", ")}
        |SELECT pr0.vec_id, pr0.p1, pr1.p2, pr2.p3, pr3.p4
        |FROM pr0 JOIN pr1 USING (vec_id) JOIN pr2 USING (vec_id)
        |JOIN pr3 USING (vec_id)
        |ORDER BY vec_id""".stripMargin,
    // x138: the x129 training replay scored once, rank-deciled, per-bin
    // integer rates (calibBinsSql — the reliability diagram).
    "x138_calibration_bins" ->
      s"""WITH $calibBinsSql
        |SELECT bin, n_docs, n_pos,
        |  CAST(n_pos * 1000000 // n_docs AS BIGINT) AS pos_ppm,
        |  min_score, max_score,
        |  CAST(sum_score // n_docs AS BIGINT) AS mean_score
        |FROM cg ORDER BY bin""".stripMargin,
    // x139: the same bins through the minimax isotonic form — pooled
    // ppm rates over every (j ≤ k) bin range via prefix sums, then
    // fit_i = max over j ≤ i of (min over k ≥ i of rate(j,k)).
    "x139_isotonic_calibration" ->
      s"""WITH $calibBinsSql, $isoFitSql
        |SELECT g.bin, g.n_docs, g.n_pos,
        |  CAST(g.n_pos * 1000000 // g.n_docs AS BIGINT) AS pos_ppm,
        |  f.iso_ppm, g.min_score, g.max_score
        |FROM cg g JOIN cfit f USING (bin) ORDER BY bin""".stripMargin,
    // x142: the calibration USED — the per-doc bin frame joined to the
    // shared isotonic fit, keep = calibrated rate ≥ 0.5. Same cb/cg/cfit
    // generators as x138/x139, so the three replays cannot drift.
    "x142_calibrated_screen" ->
      s"""WITH $calibBinsSql, $isoFitSql
        |SELECT b.doc_id, b.score, b.y, CAST(b.bin AS BIGINT) AS bin,
        |  f.iso_ppm, (f.iso_ppm >= 500000) AS kept
        |FROM cb b JOIN cfit f USING (bin)
        |ORDER BY doc_id""".stripMargin,
    // x148: the x143 deflation chain with its spectral accounting — per
    // component t1 = xᵀCx // xᵀx (HUGEINT, clamped at 0 for reporting),
    // shares in ppm of the rescaled trace, cumulative window sum, and
    // the smallest-k-clearing-target rule with the rMax fallback.
    "x148_explained_variance" ->
      s"""WITH $pcaMomentsCtesSql, cc0 AS MATERIALIZED (
        |  SELECT i, j,
        |    c // (SELECT greatest(max(abs(c)) // 100000000, 1) FROM c0) AS c
        |  FROM c0
        |), ${(0 until 4).map(k => pcaComponentSql(k, last = false)).mkString(", ")},
        |tr AS (
        |  SELECT greatest(sum(CASE WHEN i = j THEN c ELSE 0 END), 1) AS v
        |  FROM cc0
        |), tv AS (
        |${(0 until 4).map(k =>
             s"  SELECT ${k + 1} AS comp, greatest(CAST((SELECT v FROM xcx$k) " +
               s"// (SELECT v FROM xtx$k) AS BIGINT), 0) AS t1").mkString("\n      |  UNION ALL\n      |")}
        |), vr AS (
        |  SELECT comp, CAST(t1 * 1000000 // (SELECT v FROM tr) AS BIGINT) AS var_ppm
        |  FROM tv
        |), cm AS MATERIALIZED (
        |  SELECT comp, var_ppm,
        |    CAST(sum(var_ppm) OVER (ORDER BY comp) AS BIGINT) AS cum_ppm
        |  FROM vr
        |), kk AS (
        |  SELECT CAST(coalesce(min(comp), 4) AS BIGINT) AS k
        |  FROM cm WHERE cum_ppm >= 900000
        |)
        |SELECT CAST(comp AS BIGINT) AS comp, var_ppm, cum_ppm,
        |  (SELECT k FROM kk) AS k
        |FROM cm ORDER BY comp""".stripMargin,
    // x140: the data card replayed directly — x83's token idiom, x84's
    // md5 digests, per-stratum volumes/dup-mass/empties, ppm by //.
    "x140_corpus_report" ->
      """WITH tk AS MATERIALIZED (
        |  SELECT source, lang, n_chars,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    md5(text) AS digest,
        |    (len(trim(text)) = 0) AS empty
        |  FROM documents
        |), dup AS (
        |  SELECT source, lang,
        |    CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
        |      AS dup_docs,
        |    CAST(count(*) AS BIGINT) AS distinct_texts
        |  FROM (SELECT source, lang, digest, count(*) AS cnt
        |        FROM tk GROUP BY 1, 2, 3)
        |  GROUP BY 1, 2
        |), st AS (
        |  SELECT source, lang,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |    CAST(sum(CASE WHEN empty THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
        |    CAST(min(n_tokens) AS BIGINT) AS min_tokens,
        |    CAST(max(n_tokens) AS BIGINT) AS max_tokens
        |  FROM tk GROUP BY 1, 2
        |)
        |SELECT st.source, st.lang, n_docs, n_tokens, n_chars,
        |  distinct_texts, dup_docs,
        |  CAST(dup_docs * 1000000 // n_docs AS BIGINT) AS dup_ppm,
        |  n_empty, min_tokens, max_tokens,
        |  CAST(n_tokens // n_docs AS BIGINT) AS mean_tokens
        |FROM st JOIN dup USING (source, lang)
        |ORDER BY source, lang""".stripMargin,
    // x144: the x143 reduction chain replayed, then BOTH spaces' exact
    // panel top-3 and the shared hit/RR arithmetic. The reduced-space
    // cosine is written as the explicit 4-term formula WITH the
    // zero-norm→0 guard, mirroring the engine expression's loop (a
    // degenerate all-zero reduced vector must score 0 on both engines,
    // where list_cosine_similarity would NaN).
    "x144_reduced_recall" ->
      s"""WITH $pcaMomentsCtesSql, cc0 AS MATERIALIZED (
        |  SELECT i, j,
        |    c // (SELECT greatest(max(abs(c)) // 100000000, 1) FROM c0) AS c
        |  FROM c0
        |), ${(0 until 4).map(k => pcaComponentSql(k, last = k == 3)).mkString(", ")},
        |${(0 until 4).map(k =>
             s"""pr$k AS MATERIALIZED (
             |  SELECT v.vec_id, CAST(sum(v.q[x.d + 1] * x.w) AS BIGINT) AS p${k + 1}
             |  FROM vq v, xf$k x GROUP BY 1
             |)""".stripMargin).mkString(", ")},
        |rv AS MATERIALIZED (
        |  SELECT pr0.vec_id, CAST(pr0.p1 AS DOUBLE) AS r1,
        |    CAST(pr1.p2 AS DOUBLE) AS r2, CAST(pr2.p3 AS DOUBLE) AS r3,
        |    CAST(pr3.p4 AS DOUBLE) AS r4
        |  FROM pr0 JOIN pr1 USING (vec_id) JOIN pr2 USING (vec_id)
        |  JOIN pr3 USING (vec_id)
        |), fv AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), qs AS MATERIALIZED (
        |  SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 10 = 0
        |), es AS (
        |  SELECT q.query_id, n.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(qv.v, n.v), 6) AS score
        |  FROM qs q JOIN fv qv ON qv.vec_id = q.query_id, fv n
        |  WHERE n.vec_id <> q.query_id
        |), ex AS MATERIALIZED (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |    FROM es) WHERE rank <= 3
        |), rs AS (
        |  SELECT q.query_id, n.vec_id AS neighbor_id,
        |    round(CASE
        |      WHEN (a.r1*a.r1 + a.r2*a.r2 + a.r3*a.r3 + a.r4*a.r4) = 0
        |        OR (n.r1*n.r1 + n.r2*n.r2 + n.r3*n.r3 + n.r4*n.r4) = 0 THEN 0.0
        |      ELSE (a.r1*n.r1 + a.r2*n.r2 + a.r3*n.r3 + a.r4*n.r4)
        |        / (sqrt(a.r1*a.r1 + a.r2*a.r2 + a.r3*a.r3 + a.r4*a.r4)
        |           * sqrt(n.r1*n.r1 + n.r2*n.r2 + n.r3*n.r3 + n.r4*n.r4))
        |      END, 6) AS score
        |  FROM qs q JOIN rv a ON a.vec_id = q.query_id, rv n
        |  WHERE n.vec_id <> q.query_id
        |), cd AS MATERIALIZED (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |    FROM rs) WHERE rank <= 3
        |), h AS (
        |  SELECT a.query_id, count(e.neighbor_id) AS n_hits
        |  FROM cd a LEFT JOIN ex e
        |    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        |  GROUP BY a.query_id
        |), rr AS (
        |  SELECT e.query_id, coalesce(1000000 // a.rank, 0) AS rr_ppm
        |  FROM ex e LEFT JOIN cd a
        |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        |  WHERE e.rank = 1
        |)
        |SELECT q.query_id,
        |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  CAST(coalesce(h.n_hits, 0) * 1000000 // 3 AS BIGINT) AS recall_ppm,
        |  CAST(coalesce(rr.rr_ppm, 0) AS BIGINT) AS rr_ppm
        |FROM qs q LEFT JOIN h USING (query_id) LEFT JOIN rr USING (query_id)
        |ORDER BY query_id""".stripMargin,
    // x146: the composed arc — every stage oracle CTE-chained over the
    // derived pages; see webArcOracleSql's scaladoc.
    "x146_web_arc" -> webArcOracleSql,
    // x149: the same chain aggregated per stage — see webArcFunnelSql.
    "x149_arc_funnel" -> webArcFunnelSql,
    // x150: the same chain plus the closed-form image half — see
    // webArcMediaSql.
    "x150_multimodal_arc" -> webArcMediaSql,
    // x151: the robots-gated chain aggregated per stage — see
    // webArcRobotsFunnelSql.
    "x151_robots_arc" -> webArcRobotsFunnelSql,
    // x152: the image CTEs aggregated per stage with closed-form
    // Content-Lengths — see mediaFunnelSql.
    "x152_media_funnel" -> mediaFunnelSql,
    // x153: every record's byte offset and length re-derived from the
    // mixed container's layout — text headers strlen'd in SQL (the x98
    // idiom), image payloads from the x152 BMP/GIF size closed forms.
    "x153_media_cdx" ->
      ("WITH " + mediaContainerSizedCtesSql("doc_id % 5 = 1") + ", " +
        """toff AS (
        |  SELECT doc_id, 'page' AS rec_kind, CAST(i AS INT) AS rec_idx,
        |    'text/html' AS content_type,
        |    'com,example)/doc/' || ids || '/' || i AS surt_key,
        |    isize + coalesce(sum(rsize) OVER (
        |      PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rec_offset,
        |    rsize AS rec_len
        |  FROM tsized
        |), ioff AS (
        |  SELECT doc_id, 'image' AS rec_kind, CAST(j AS INT) AS rec_idx,
        |    'image/' || ext AS content_type,
        |    'com,example)/img/' || ids || '/' || j || '.' || ext AS surt_key,
        |    text_end + coalesce(sum(rsize) OVER (
        |      PARTITION BY doc_id ORDER BY j
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rec_offset,
        |    rsize AS rec_len
        |  FROM isized
        |), aoff AS (
        |  SELECT doc_id, 'audio' AS rec_kind, CAST(k AS INT) AS rec_idx,
        |    'audio/wav' AS content_type,
        |    'com,example)/aud/' || ids || '/' || k || '.wav' AS surt_key,
        |    img_end + coalesce(sum(rsize) OVER (
        |      PARTITION BY doc_id ORDER BY k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rec_offset,
        |    rsize AS rec_len
        |  FROM asized
        |), voff AS (
        |  SELECT doc_id, 'video' AS rec_kind, CAST(v AS INT) AS rec_idx,
        |    'video/avi' AS content_type,
        |    'com,example)/vid/' || ids || '/' || v || '.avi' AS surt_key,
        |    aud_end + coalesce(sum(rsize) OVER (
        |      PARTITION BY doc_id ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rec_offset,
        |    rsize AS rec_len
        |  FROM vsized
        |)
        |SELECT doc_id, rec_kind, rec_idx, content_type, surt_key,
        |  CAST(rec_offset AS BIGINT) AS rec_offset,
        |  CAST(rec_len AS BIGINT) AS rec_len
        |FROM (SELECT * FROM toff UNION ALL SELECT * FROM ioff
        |      UNION ALL SELECT * FROM aoff UNION ALL SELECT * FROM voff)
        |ORDER BY doc_id, rec_offset""".stripMargin),
    // x154: the audio route replayed closed-form — every decoded sample
    // statistic re-folded from the congruence formula, then the same
    // screen/dedup/cap arithmetic. See audioRouteSql.
    "x154_audio_route" -> audioRouteSql,
    // x155: the audio CTEs aggregated per stage, byte mass from the WAV
    // 44+2n closed form. See audioFunnelSql.
    "x155_audio_funnel" -> audioFunnelSql,
    // x156: the video route replayed closed-form — every sampled frame's
    // checksum from the payload congruence. See videoRouteSql.
    "x156_video_route" -> videoRouteSql,
    // x157: the video CTEs aggregated per stage, byte mass from the AVI
    // 224+32·frames closed form. See videoFunnelSql.
    "x157_video_funnel" -> videoFunnelSql,
    // x158: the sized CTEs aggregated per record kind plus the container
    // row — the spans must tile the files. See containerCensusSql.
    "x158_container_census" -> containerCensusSql,
    // x159: the x24 recursive next-fit walk with a TWO-field fill; bytes
    // re-derived from the shared container layout generator.
    "x159_pack_multimodal" ->
      ("WITH RECURSIVE " + mediaContainerSizedCtesSql("1 = 1") + ", " +
        """tok AS (
        |  SELECT d.doc_id, d.doc_id % 32 AS grp,
        |    CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT) AS toks,
        |    CAST(v.file_end AS BIGINT) AS bytes
        |  FROM d JOIN vtot v USING (doc_id)
        |), ranked AS (
        |  SELECT doc_id, grp, toks, bytes,
        |    row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
        |  FROM tok
        |), walk AS (
        |  SELECT doc_id, grp, toks, bytes, rn,
        |    CAST(0 AS BIGINT) AS bin, toks AS ftok, bytes AS fbyte
        |  FROM ranked WHERE rn = 1
        |  UNION ALL
        |  SELECT r.doc_id, r.grp, r.toks, r.bytes, r.rn,
        |    CASE WHEN (w.ftok + r.toks > 256 OR w.fbyte + r.bytes > 16384)
        |              AND w.ftok + w.fbyte > 0
        |         THEN w.bin + 1 ELSE w.bin END,
        |    CASE WHEN (w.ftok + r.toks > 256 OR w.fbyte + r.bytes > 16384)
        |              AND w.ftok + w.fbyte > 0
        |         THEN r.toks ELSE w.ftok + r.toks END,
        |    CASE WHEN (w.ftok + r.toks > 256 OR w.fbyte + r.bytes > 16384)
        |              AND w.ftok + w.fbyte > 0
        |         THEN r.bytes ELSE w.fbyte + r.bytes END
        |  FROM ranked r JOIN walk w ON r.grp = w.grp AND r.rn = w.rn + 1
        |)
        |SELECT grp, bin, doc_id AS doc, toks, bytes,
        |  CAST(sum(toks) OVER (PARTITION BY grp, bin) AS BIGINT) AS bin_toks,
        |  CAST(sum(bytes) OVER (PARTITION BY grp, bin) AS BIGINT) AS bin_bytes,
        |  toks > 256 OR bytes > 16384 AS oversize
        |FROM walk ORDER BY doc""".stripMargin),
    // x130: the 4-class replay — same generator as x126 with
    // (seed m, 4 classes, 256 buckets); strict smallest-index argmax as
    // the >= cascade (class c wins only if it beats every later class,
    // earlier classes get first claim — exactly the strict-> keep rule).
    "x130_ft_multiclass" ->
      s"""WITH ${ftCtes("m", classes = 4, dim = 256)}
        |SELECT doc_id, n_feats, dot0, dot1, dot2, dot3,
        |  CASE WHEN dot0 >= dot1 AND dot0 >= dot2 AND dot0 >= dot3 THEN CAST(0 AS BIGINT)
        |       WHEN dot1 >= dot2 AND dot1 >= dot3 THEN CAST(1 AS BIGINT)
        |       WHEN dot2 >= dot3 THEN CAST(2 AS BIGINT)
        |       ELSE CAST(3 AS BIGINT) END AS pred
        |FROM ftdots ORDER BY doc_id""".stripMargin,
    // x131: three one-vs-all training chains unrolled (the x128
    // discipline, one generator call per class with the per-class ±1
    // relabel), one final scoring pass per class over the shared
    // label-independent counts, strict smallest-index argmax.
    "x131_ova_train_infer" ->
      s"""WITH $ovaCtesSql
        |SELECT doc_id, score0, score1, score2, pred_cls,
        |  CAST(doc_id % 3 AS BIGINT) AS true_cls,
        |  (pred_cls = doc_id % 3) AS correct
        |FROM pr ORDER BY doc_id""".stripMargin,
    // x132: x131's replay + the per-class confusion aggregation and the
    // integer-ppm metric divisions (// is DuckDB's BIGINT div, matching
    // Spark's `div` on nonnegative longs).
    "x132_eval_confusion" ->
      s"""WITH $ovaCtesSql, lab AS (
        |  SELECT doc_id, pred_cls, doc_id % 3 AS true_cls FROM pr
        |), conf AS (
        |  SELECT c.range AS cls,
        |    CAST(sum(CASE WHEN true_cls = c.range AND pred_cls = c.range
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN true_cls <> c.range AND pred_cls = c.range
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN true_cls = c.range AND pred_cls <> c.range
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM range(0, 3) c, lab GROUP BY 1
        |)
        |SELECT CAST(cls AS BIGINT) AS cls, tp, fp, fn,
        |  CAST(tp * 1000000 // greatest(tp + fp, 1) AS BIGINT) AS precision_ppm,
        |  CAST(tp * 1000000 // greatest(tp + fn, 1) AS BIGINT) AS recall_ppm,
        |  CAST(tp * 2000000 // greatest(tp * 2 + fp + fn, 1) AS BIGINT) AS f1_ppm
        |FROM conf ORDER BY cls""".stripMargin,
    // x133: x131's replay + the margin arithmetic (2·max + min − Σ over
    // the three BIGINT scores) + per-class row_number on (margin,
    // doc_id) — the exact tie order TopKByLongScore keeps on the
    // negated score.
    "x133_uncertain_docs" ->
      s"""WITH $ovaCtesSql, u AS (
        |  SELECT doc_id, pred_cls,
        |    greatest(score0, score1, score2) * 2 +
        |    least(score0, score1, score2) -
        |    (score0 + score1 + score2) AS unc
        |  FROM pr
        |), rk AS (
        |  SELECT pred_cls, doc_id, unc,
        |    row_number() OVER (PARTITION BY pred_cls ORDER BY unc, doc_id) AS rank
        |  FROM u
        |)
        |SELECT pred_cls, CAST(rank AS BIGINT) AS rank, doc_id,
        |  CAST(unc AS BIGINT) AS margin
        |FROM rk WHERE rank <= 5 ORDER BY pred_cls, rank""".stripMargin
  )
}
