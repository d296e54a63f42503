package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Bpe, Robust, Triangles}

/** Round-6 scaling-evidence probe (dev tool, ScaleProbe discipline):
  * measure the new operators' scale claims as ratios, not plan-shape
  * arguments.
  *
  *   - binned quantile: events ×K — occupied-bin count (the exchange's
  *     row budget) must stay ~constant while input rows grow ×K, and the
  *     selection must touch ~1/bins of the data;
  *   - triangles: a hub graph with K leaves — naive wedge candidates grow
  *     K², the degree-oriented join's grow ~K (measured candidate counts);
  *   - BPE: documents ×K — the per-iteration work runs over the WORD
  *     table, which is constant while the corpus grows (the web-corpus
  *     fixed-vocabulary shape), so learn wall should stay ~flat after the
  *     word-count aggregation.
  *
  * Usage: runMain graft.tools.ProbeRound6 [sfDir] [reps...]
  */
object ProbeRound6 {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  private def minOf2[A](f: => A): Double =
    Seq.fill(2)(time(f)._1).min

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def eventsTimes(k: Int): DataFrame = {
      val base = spark.read
        .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .parquet(s"$dir/events.parquet")
        .select(col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
      base.select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("copy"))
        .select(col("event_type"), (col("v") + col("copy")).as("v"))
    }

    reps.foreach { k =>
      val ev = eventsTimes(k).persist()
      val n = ev.count()
      val bins = ev
        .groupBy(col("event_type"), expr("v >> 10").as("bin")).count().count()
      val w = minOf2 {
        Robust.binnedQuantileDisc(ev, col("event_type"), col("v"), 1, 2, 10)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"PROBE quantile k=$k%-3d rows=$n%9d occupied_bins=$bins%6d wall=$w%6.2f")
      ev.unpersist()
    }

    reps.foreach { k =>
      // hub with 50·k leaves + a ring among leaves for some triangles
      val leaves = 50 * k
      val hubEdges = spark.range(leaves).select(lit("hub").as("a"), concat(lit("n"), col("id")).as("b"))
      val ring = spark.range(leaves).select(
        concat(lit("n"), col("id")).as("a"),
        concat(lit("n"), (col("id") + 1) % leaves).as("b"))
      val edges = hubEdges.unionAll(ring)
      // naive wedge candidates: join on the shared neighbor WITHOUT
      // orientation — the hub contributes leaves² wedge rows
      val naiveWedges = {
        val bidir = edges.select(col("a"), col("b"))
          .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
        val l = bidir.select(col("a").as("p"), col("b").as("x"))
        val r = bidir.select(col("a").as("p"), col("b").as("y"))
        l.join(r, "p").where(col("x") < col("y")).count()
      }
      val (wallTri, triRows) = time {
        Triangles.perNode(edges).agg(sum("n_triangles")).head().getLong(0)
      }
      println(f"PROBE triangles k=$k%-3d edges=${2L * leaves}%8d naive_wedges=$naiveWedges%10d tri_sum=$triRows%8d wall=$wallTri%6.2f")
    }

    reps.foreach { k =>
      val base = spark.read.parquet(s"$dir/documents.parquet").select("text")
      val docs = base
        .select(col("text"), explode(sequence(lit(0), lit(k - 1))).as("c"))
        .select("text")
      val nd = docs.count()
      val w = minOf2 {
        Bpe.learnMerges(docs, m = 3).collect()
      }
      println(f"PROBE bpe k=$k%-3d docs=$nd%9d wall=$w%6.2f")
    }

    spark.stop()
  }
}
