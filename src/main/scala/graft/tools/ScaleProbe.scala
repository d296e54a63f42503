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

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local(32, "scale-probe")
    GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def probe(name: String, k: Int, rows: Long)(f: => Long): Unit = {
      val walls = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val w = walls.min
      println(f"PROBE $name%-14s k=$k%-3d rows=$rows%-10d wall=$w%7.2f s  thru=${rows / w / 1e6}%8.3f Mrows/s")
    }

    reps.foreach { k =>
      val docs = docsTimes(spark, dir, k).persist()
      val nDocs = docs.count()

      probe("text_stats", k, nDocs)(
        TextAnalysis.withTextStats(docs).agg(sum(col("n_tokens"))).count()
      )
      probe("exact_dedup", k, nDocs)(Dedup.exact(docs).count())
      probe("tfidf_top3", k, nDocs)(TextAnalysis.tfIdfTopTerms(docs, 3).count())
      probe("pack_nextfit", k, nDocs)(
        Pack.nextFit(
          docs.select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).as("n_tokens")),
          "doc_id", "n_tokens", capacity = 256, numGroups = 32 * k
        ).count()
      )
      docs.unpersist()

      val evs = eventsTimes(spark, dir, k).persist()
      val nEv = evs.count()
      probe("keep_last", k, nEv)(
        graft.operators.Snapshot
          .keepLastBy(evs, Seq("user_id"), Seq(col("ts"), col("event_id")))
          .count()
      )
      evs.unpersist()
    }
    spark.stop()
  }
}
