package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Constrained-memory spill tier (round-13 verdict #2): local[32]/128 GiB
  * never exercises spill, so "survives memory pressure" was an untested
  * claim at 100 TB posture. This main runs the 20 heaviest registry
  * queries (by the committed sf0.1 quiet-baseline best wall) under
  * whatever heap the JVM was given (`SPARK_DRIVER_MEM=3g sbt "runMain
  * graft.SpillBench ..."` — build.sbt wires the env straight into -Xmx)
  * with a spill-HOSTILE session: broadcast threshold dropped to 256 KiB
  * (plan-level `broadcast()` hints still apply — a hinted broadcast of a
  * provably small side is scale-correct — but every threshold-derived
  * broadcast becomes a real sort-merge join with spillable sorts), AQE
  * skew splitting on, shuffle partitions raised so individual partitions
  * stay small enough to spill instead of OOM.
  *
  * Per query it records wall seconds, row count, and an ORDER-INDEPENDENT
  * content hash (sum of per-row xxhash64 over all columns rendered as
  * strings, column order canonicalized — wrap-on-overflow is exact and
  * deterministic under the non-ANSI session both tiers use). The gate
  * (scripts/spill_check.py) runs the same main at the normal 16 GiB heap
  * and asserts every query finishes (zero OOM) with IDENTICAL rows+hash —
  * memory pressure may change timing and spill volume, never answers.
  */
object SpillBench {

  /** The heaviest sf0.1 surfaces by committed quiet-baseline best
    * wall (bench_baseline.json) — the population whose
    * TypedImperativeAggregate buffers, pair-mining shuffles, and
    * iterative joins actually stress execution memory — plus the
    * round-13 training surfaces (x128/x131: the persisted bucket-count
    * table and per-round broadcast of misclassified ids are exactly the
    * structures a small heap threatens).
    */
  val Heaviest: Seq[String] = Seq(
    "x11_embed_neardup", "x81_semdedup", "x103_ccnet_buckets",
    "x46_pagerank", "x72_seed_distance", "x112_int_lsh_hardneg",
    "x44_cluster_canonical", "x82_cooccurrence", "x78_hits",
    "x76_containment", "x14_neardup_clusters", "x71_leakage_split",
    "x06_ngram_jaccard", "x119_ivf_pq_adc", "q28_stats_agg",
    "x67_incremental_ingest", "x105_curriculum", "x70_lm_fluency",
    "x104_hard_negatives", "x122_remove_spans",
    "x128_perceptron_train", "x131_ova_train_infer",
    // second-continuation additions: the ANN recall eval (the brute
    // ground-truth broadcast plus the banded candidate join under one
    // heap) and the PCA projection (the IntGram buffer is a
    // dim(dim+1)/2-long TypedImperativeAggregate — the exact buffer
    // class this tier exists to pressure)
    "x135_ann_recall", "x137_pca_project",
    // round-14 additions: the composed web arc (two localCheckpoint
    // materializations + the LSH miner + a training loop under ONE
    // heap — the only surface that holds several stages' state at
    // once) and the distributed BT fit (per-round checkpointed ratings
    // frames + DECIMAL denominator aggs)
    "x146_web_arc", "x147_bt_distributed",
    // round-15 additions: the multimodal arc (the text arc's state PLUS
    // the persisted banded image signatures and the fused join under
    // one heap) and the robots-gated funnel (the observe()-based
    // single-pass funnel's CollectMetrics accumulators riding both
    // checkpoint materializations)
    "x150_multimodal_arc", "x151_robots_arc")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val heapMb = Runtime.getRuntime.maxMemory() / (1024L * 1024L)
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft-spill")
      .withExtensions(new GraftExtensions)
      // high partition count: under a small heap the survival strategy is
      // many small spillable partitions, never one partition that must fit
      .config("spark.sql.shuffle.partitions", (cpus * 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // 256 KiB: threshold-derived broadcasts become spillable SMJs; the
      // explicit broadcast() hints in query code (small dims, bounded
      // med/MAD frames) are deliberate and keep applying
      .config("spark.sql.autoBroadcastJoinThreshold", (256 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = Heaviest.map { name =>
      val t0 = System.nanoTime()
      val outcome =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          // order-independent content hash: per-row xxhash64 over every
          // column rendered as string (sorted column order), summed with
          // deterministic wrap — one distributed pass, O(1) driver state
          val cols = df.columns.sorted.toSeq
            .map(c => coalesce(col(c).cast("string"), lit("\u0000null")))
          val row = df
            .select(xxhash64(cols: _*).as("h"))
            .agg(count(lit(1)).as("n"), sum(col("h")).as("hs"))
            .head()
          Right((row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1)))
        } catch {
          case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      val wall = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[spill] $name%-28s ${wall}%8.2fs ${outcome.fold(identity, r => s"rows=${r._1}")}")
      (name, wall, outcome)
    }

    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val qjson = results
      .map { case (name, wall, oc) =>
        val body = oc match {
          case Right((n, h)) => f""""wall":$wall%.3f,"rows":$n,"hash":$h,"err":null"""
          case Left(err) => f""""wall":$wall%.3f,"rows":-1,"hash":0,"err":"${esc(err)}""""
        }
        s""""$name":{$body}"""
      }
      .mkString(",")
    val json =
      s"""{"heap_mb":$heapMb,"cpus":$cpus,"sf_dir":"${esc(sfDir)}","queries":{$qjson}}"""
    Files.writeString(Paths.get(outPath), json)
    println(json)
    spark.stop()
  }
}
