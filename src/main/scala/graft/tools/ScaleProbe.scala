package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.GraftFunctions
import graft.operators.{Dedup, Pack, TextAnalysis}

/** Scaling-evidence probe (dev tool): replicate the sf0.1 inputs K× with
  * id-space shifts and measure wall time per operator family, so the
  * "would this survive a scale-up" claim is a measured ratio instead of a
  * plan-shape argument. Replication preserves each probe's work profile:
  *
  *   - map-only text stats / tfidf: rows ×K, per-row work constant
  *     (tfidf's vocabulary — and so its broadcast side — stays fixed while
  *     corpus grows, exactly the web-corpus shape);
  *   - exact dedup: duplicate groups of size K are INTENDED — the digest
  *     groupBy's reduce side grows, the shuffle stays one pass;
  *   - keep-last over events: key cardinality ×K (ids shifted), state per
  *     key constant;
  *   - packing: groups stay bounded (numGroups scales with K), the fold
  *     length per group constant.
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir] [reps...]
  * Prints PROBE lines: name, K, input rows, wall s (min of 2), Mrows/s.
  */
object ScaleProbe {

  private def docsTimes(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    base
      .select(col("doc_id"), col("text"), explode(sequence(lit(0), lit(k - 1))).as("copy"))
      .select((col("doc_id") * k + col("copy")).as("doc_id"), col("text"))
  }

  private def eventsTimes(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val base = spark.read
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")
    base
      .select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("copy"))
      .select(
        (col("event_id") * k + col("copy")).as("event_id"),
        col("ts"),
        (col("user_id") * k + col("copy")).as("user_id"),
        col("value")
      )
  }

  /** Replication for PAIR-MINING probes: every 3rd token is salted with the
    * copy index, so any word 3-gram of a copy contains ≥1 salted token and
    * copies share ZERO 3-grams with each other or the originals. Near-dup
    * pair output therefore stays ~constant while the corpus (and the
    * inverted index / LSH bucket load) grows K× — a clean linearity probe
    * for the quadratic-prone operators. Unsalted replication would instead
    * measure the intended worst case: K-sized duplicate groups emit K²/2
    * pairs each.
    */
  private def saltedDocsTimes(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    base
      .select(col("doc_id"), col("text"), explode(sequence(lit(0), lit(k - 1))).as("copy"))
      .select(
        (col("doc_id") * k + col("copy")).as("doc_id"),
        concat_ws(
          " ",
          transform(
            split(trim(col("text")), "\\s+"),
            (t, i) =>
              when(i % 3 === 0 && col("copy") > 0, concat(t, lit("_"), col("copy")))
                .otherwise(t)
          )
        ).as("text")
      )
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local(32, "scale-probe")
    GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    // optional substring filter (SPARK_GRAFT_PROBE=heavy) to run one
    // family without paying for the whole sweep
    val filter = sys.env.get("SPARK_GRAFT_PROBE")
    def probe(name: String, k: Int, rows: Long)(f: => Long): Unit = {
      if (filter.exists(s => !name.contains(s))) return
      val samples = (1 to 2).map { _ =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime(); f
        ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
      }
      val (w, c) = samples.minBy(_._1)
      println(f"PROBE $name%-14s k=$k%-3d rows=$rows%-10d wall=$w%7.2f s cpu=$c%8.2f s  thru=${rows / w / 1e6}%8.3f Mrows/s")
    }

    reps.foreach { k =>
      val docs = docsTimes(spark, dir, k).persist()
      val nDocs = docs.count()

      probe("text_stats", k, nDocs)(
        TextAnalysis.withTextStats(docs).agg(sum(col("n_tokens"))).count()
      )
      probe("exact_dedup", k, nDocs)(Dedup.exact(docs).count())
      probe("tfidf_top3", k, nDocs)(TextAnalysis.tfIdfTopTerms(docs, 3).count())
      probe("tfidf_cached_toks", k, nDocs) {
        val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks")).persist()
        val tf = toks
          .select(col("doc_id"), explode(col("toks")).as("term"))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val n = tf.count()
        toks.unpersist()
        n
      }
      probe("tfidf_live_toks", k, nDocs)(
        docs
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
          .count()
      )
      probe("pack_nextfit", k, nDocs)(
        Pack.nextFit(
          docs.select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).as("n_tokens")),
          "doc_id", "n_tokens", capacity = 256, numGroups = 32 * k
        ).count()
      )
      docs.unpersist()

      val salted = saltedDocsTimes(spark, dir, k).persist()
      val nSalted = salted.count()
      probe("minhash_lsh", k, nSalted)(
        Dedup.minhashLshPairs(salted, n = 3, threshold = 0.5, bands = 32, rowsPerBand = 4).count()
      )
      // x06's inverted-index pair mining — the round-4 df-prune rewrite
      // (groupBy + broadcast-anti-join, no map-side-aggregation-free
      // window) should keep this family linear as the index load grows
      probe("ngram_jaccard", k, nSalted)(
        Dedup.ngramJaccardPairs(salted, n = 3, threshold = 0.5).count()
      )
      // x43's two-phase sketch+recount vs the one-phase groupBy over every
      // token, on an OPEN-VOCABULARY input (every other token uniquified
      // per doc — the web-corpus shape where distinct tokens grow with the
      // corpus): the one-phase shuffle carries the whole vocabulary, the
      // MG sketch ships O(partitions × k) entries regardless
      val vocabHeavy = salted.select(
        col("doc_id"),
        concat_ws(
          " ",
          transform(
            split(trim(col("text")), "\\s+"),
            (t, i) =>
              when(i % 2 === 0, concat(t, lit("_u"), col("doc_id"))).otherwise(t)
          )
        ).as("text")
      )
      probe("heavy_mg", k, nSalted)(
        TextAnalysis.heavyTokens(vocabHeavy, phiNum = 1L, phiDenom = 50L, k = 100).count()
      )
      probe("heavy_onephase", k, nSalted)(
        vocabHeavy
          .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("cnt"))
          .count()
      )
      probe("grams_naive_shape", k, nSalted)(
        Dedup
          .withShingles(salted.where(col("doc_id") % 50 =!= 0), 3)
          .select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"),
            explode(col("sh")).as("gram"))
          .count()
      )
      probe("grams_cached_shape", k, nSalted) {
        val sh = Dedup
          .withShingles(salted.where(col("doc_id") % 50 =!= 0), 3)
          .persist()
        val n = sh
          .select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"),
            explode(col("sh")).as("gram"))
          .count()
        sh.unpersist()
        n
      }
      probe("decont_eval", k, nSalted)(
        salted.where(col("doc_id") % 50 === 0)
          .select(explode(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)).as("gram"))
          .distinct()
          .count()
      )
      probe("decontaminate", k, nSalted)(
        graft.operators.Decontaminate
          .overlap(
            corpus = salted.where(col("doc_id") % 50 =!= 0),
            evalSet = salted.where(col("doc_id") % 50 === 0),
            n = 3
          )
          .count()
      )
      // x45's symmetric-deletion blocking over an OPEN vocabulary (distinct
      // strings grow ~linearly with the corpus): blocking cost is
      // variants × log — near-linear — where the brute-force levenshtein
      // twin is quadratic in the vocabulary. The brute twin only runs on a
      // fixed 1/64 hash slice (it would be ~10^11 pairs at full k=1);
      // blocking runs on both the slice (same-input ratio) and the full
      // growing vocabulary (scaling curve).
      val fuzzyVocab = vocabHeavy
        .select(explode(TextAnalysis.tokens(col("text"))).as("s"))
        .distinct()
        .persist()
      val nVocab = fuzzyVocab.count()
      probe("fuzzy_symspell", k, nVocab)(
        graft.operators.Fuzzy.editDistance1Pairs(fuzzyVocab, "s").count()
      )
      if (k == reps.min) {
        val small = fuzzyVocab.where(abs(hash(col("s"))) % 64 === 0).persist()
        val nSmall = small.count()
        probe("fuzzy_brute", k, nSmall)(
          small.as("a")
            .join(small.as("b"), col("a.s") < col("b.s"))
            .where(levenshtein(col("a.s"), col("b.s")) <= 1)
            .count()
        )
        probe("fuzzy_block", k, nSmall)(
          graft.operators.Fuzzy.editDistance1Pairs(small, "s").count()
        )
        small.unpersist()
      }
      fuzzyVocab.unpersist()
      salted.unpersist()

      val evs = eventsTimes(spark, dir, k).persist()
      val nEv = evs.count()
      probe("keep_last", k, nEv)(
        graft.operators.Snapshot
          .keepLastBy(evs, Seq("user_id"), Seq(col("ts"), col("event_id")))
          .count()
      )
      // q33's islands compression: key cardinality grows ×K while state
      // per key stays constant — the one-exchange window/agg stack should
      // scale with rows, not keys (the Sessionize bound)
      probe("scd2_islands", k, nEv)(
        graft.operators.Scd2
          .compressHistory(
            evs.withColumn("event_type", (col("event_id") % 5).cast("string")),
            keyCol = col("user_id"),
            stateCol = col("event_type"),
            orderCols = Seq(col("ts"), col("event_id")),
            validityCol = col("ts")
          )
          .count()
      )
      evs.unpersist()
    }
    spark.stop()
  }
}
