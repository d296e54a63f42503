package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scaling-exponent probe for the heavy-tail registered surfaces (dev
  * tool, r10 verdict #6): run the EXACT registered query (not a
  * replica) at two scale factors, fit wall ∝ rows^e per family, and flag
  * anything super-linear beyond its documented law.
  *
  * Documented laws (what "fine" means per family):
  *   - x77 label-prop / x46 pagerank: rounds × (edges join + agg) — e ≈ 1
  *     in edges at fixed round count;
  *   - x11 embed near-dup: the registered corpus sits on the documented
  *     small-corpus EXACT branch (n ≤ 1e5), which is O(n²) BY CONTRACT —
  *     e ≈ 2 here is the documented law, not a regression; the scale path
  *     is the LSH branch (x113), e ≈ 1;
  *   - x72 seed distance: BFS rounds over fixed-length chains — e ≈ 1;
  *   - x103 ccnet buckets: scan + group-ntile two-phase rank — e ≈ 1.
  *
  * Usage: runMain graft.tools.ExponentProbe [sfA sfB]
  * Prints one EXP line per family: wall at both SFs (min of 2 after one
  * warm-up), the input-rows ratio actually realized, and the fitted e.
  */
object ExponentProbe {

  private val families: Seq[(String, String)] = Seq(
    "x77_label_prop" -> "part",
    "x11_embed_neardup" -> "embeddings",
    "x46_pagerank" -> "orders",
    "x72_seed_distance" -> "documents",
    "x103_ccnet_buckets" -> "documents",
    // round-11 additions: the BPE encode (linear in corpus positions on
    // top of the fixed 64-round merge chain) and IVFADC (training rounds
    // are fixed driver jobs; the probe join is candidate-bound)
    "x121_bpe_encode" -> "documents",
    "x119_ivf_pq_adc" -> "embeddings",
    // round-12 additions: BM25 (one token-keyed exchange + broadcast
    // query probe — e ≈ 1 in corpus tokens) and d=2 fuzzy blocking
    // (variants quadratic in string LENGTH, linear in the value domain;
    // p_name's domain is near-constant across SFs, so wall should be
    // ~flat — a rising e here would mean the join went quadratic)
    "x115_bm25_topk" -> "documents",
    "x123_fuzzy_editdist2" -> "part",
    // round-13 addition: learned-model inference is map-only (weights are
    // plan literals, zero exchanges) — e must sit at ~1 in documents; a
    // rising e would mean the scorer grew a join it must never have
    "x126_ft_classify" -> "documents",
    // round-13 additions (continuation): the learned screen (dedup
    // exchange + map-only scorer — e ≈ 1), perceptron training (fixed
    // rounds over the persisted bucket-count table: one doc-keyed agg +
    // one broadcast + one bucket-keyed agg per round — e ≈ 1 in corpus
    // tokens; a rising e would mean the mis-set broadcast degenerated),
    // and the 4-class head (same map-only law as x126 — the per-row cost
    // is C× the arithmetic but the EXPONENT must not move)
    "x127_ft_curation" -> "documents",
    "x128_perceptron_train" -> "documents",
    "x130_ft_multiclass" -> "documents",
    // second-continuation additions: BT rating (two log-keyed reductions
    // + the items²-bounded driver fixpoint — e ≈ 1 in comparisons) and
    // the PCA projection (one IntGram pass over the training half + a
    // map-only literal-component projection — e ≈ 1 in vectors; a rising
    // e would mean the moments agg lost its partial-aggregation shape).
    // x135 is deliberately NOT watched: its exact ground-truth stage is
    // the documented offline-eval brute posture (panel × corpus), and
    // its sampleMod knob exists precisely so a 100 TB caller pins the
    // panel size; the banded ANN side shares x111's watched law.
    "x136_bt_rating" -> "documents",
    "x137_pca_project" -> "embeddings",
    // round-14 additions: the composed web arc (every stage individually
    // ≈ linear; the LSH pair miner and the calibration rank are the only
    // exchanges whose inputs grow with the corpus — e ≈ 1 in documents,
    // a rising e would mean a stage's candidate bound broke inside the
    // composition), the distributed BT fit (same two log-keyed
    // reductions as x136 plus items-bounded per-round joins — e ≈ 1 in
    // comparisons with a fixed-round floor), and the explained-variance
    // chain (one IntGram pass over the training half + a dim²-bounded
    // driver solve — e ≈ 1 in vectors, mostly flat at these SFs)
    "x146_web_arc" -> "documents",
    "x147_bt_distributed" -> "documents",
    "x148_explained_variance" -> "embeddings",
    // the funnel shares x146's stage laws by construction (same frames,
    // plus eight bounded aggregates) — watched so a future stage edit
    // that breaks a candidate bound shows up here too
    "x149_arc_funnel" -> "documents",
    // round-15 additions: the multimodal arc (the x146 text law plus a
    // banded Hamming join over per-image 64-bit signatures and the
    // doc-keyed fusion join — e ≈ 1 in documents; a rising e would mean
    // the image candidate bound broke), and the robots-gated funnel
    // (one extra map-side predicate on the x149 law — the gate must not
    // change the exponent, only the constant)
    "x150_multimodal_arc" -> "documents",
    "x151_robots_arc" -> "documents",
    // the media funnel shares the image route's laws (one walk+decode
    // pass, the banded join, the cap window — e ≈ 1 in documents)
    "x152_media_funnel" -> "documents",
    // the media CDX is one walk + a per-FILE lead window (bounded by
    // records-per-file, never a global sort) — e ≈ 1 in documents
    "x153_media_cdx" -> "documents",
    // the audio route: one walk+decode pass, one fingerprint exchange
    // (ids + five integers), one cap window — e ≈ 1 in documents; its
    // funnel shares the same frames
    "x154_audio_route" -> "documents",
    "x155_audio_funnel" -> "documents",
    // the video route: one walk + stride-2 frame-sampled decode, one
    // signature exchange, one cap window — e ≈ 1 in documents
    "x156_video_route" -> "documents",
    "x157_video_funnel" -> "documents",
    // the census: one walk + per-file lead window + a 6-row aggregate
    "x158_container_census" -> "documents",
    // the 2-D pack: one build pass + the x24 bounded-group fold
    "x159_pack_multimodal" -> "documents",
    // the dedup eval: the x06 inverted-index miner + the x28 banded
    // simhash join + one confusion aggregate
    "x160_dedup_eval" -> "documents")

  def main(args: Array[String]): Unit = {
    val (sfA, sfB) =
      if (args.length >= 2) (args(0), args(1))
      else ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    // optional third arg: comma-separated family names — probe just the
    // new rows without paying the full 23-family sweep
    val only: Set[String] =
      if (args.length >= 3) args(2).split(",").map(_.trim).toSet else Set.empty
    val spark = GraftSession.local(32, "exponent-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def rows(dir: String, table: String): Long =
      spark.read.parquet(s"$dir/$table.parquet").count()
    def time(name: String, dir: String): Double = {
      // x128's registered query memoizes trained weights per dir (the x64
      // shared-cache disclosure), so its timed reps would measure a cache
      // hit; probe the actual training loop with the registered contract
      // (planted even-odd labels, dim 512, rounds 3) instead
      def once(): Unit =
        if (name == "x128_perceptron_train") {
          import org.apache.spark.sql.functions._
          // mirror the registered surface's plan shape: dts() spreads the
          // scan over defaultParallelism before training, so the probe
          // must too — a raw scan's 1-2 natural splits at small SFs would
          // bias the fitted exponent low
          val docs = spark.read.parquet(s"$dir/documents.parquet")
            .repartition(spark.sparkContext.defaultParallelism)
            .select(col("doc_id"), col("text"))
            .withColumn("y", when(col("doc_id") % 2 === 0, 1L).otherwise(-1L))
          graft.operators.LinearModel
            .trainPerceptron(docs, "text", "y", dim = 512, rounds = 3)
        } else {
          SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
      once() // warm-up
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        once()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    families.filter(f => only.isEmpty || only(f._1)).foreach { case (name, table) =>
      val (rA, rB) = (rows(sfA, table), rows(sfB, table))
      val (wA, wB) = (time(name, sfA), time(name, sfB))
      val e = math.log(wB / wA) / math.log(rB.toDouble / rA)
      println(f"EXP $name%-20s rows=$rA%-8d->$rB%-8d wall=$wA%7.2f->$wB%7.2f s  e=$e%5.2f")
    }
    spark.stop()
  }
}
