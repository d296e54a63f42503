package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.TextAnalysis

/** Round-7 scaling-evidence probe (dev tool): measure the candidate-volume
  * claims behind the two new quadratic-risk operators, so SURVEY §8.4a
  * carries ratios instead of plan-shape arguments.
  *
  *   1. x76 containment: candidates from the one-sided prefix
  *      (contained-side prefix × containing-side full postings) vs the
  *      count-every-co-occurrence join it replaces (full × full).
  *   2. x82 co-occurrence projection: pair rows mined with the degree cap
  *      vs uncapped — the hub mass the df-prune discipline removes.
  */
object ProbeRound7 {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    // --- x76 candidate volumes (threshold 0.6, the surface's setting) ---
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
    val excerpts = docs
      .where(size(TextAnalysis.tokens(col("text"))) >= 24)
      .select(
        (col("doc_id") + 20000).as("doc_id"),
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 12)).as("text"))
    val corpus = docs.unionAll(excerpts)
    val post = corpus
      .select(col("doc_id"), explode(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)).as("sh"))
      .persist()
    val tEff = 0.6 - 1e-6
    val sized = post.groupBy("doc_id").agg(count(lit(1)).as("n")).persist()
    // rarest-first (df, shingle) prefix order — the operator's actual order
    val dfc = post.groupBy("sh").agg(count(lit(1)).as("df"))
    val prefLen = post
      .join(dfc, "sh")
      .join(sized, "doc_id")
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("df", "sh")))
      .where(col("r") <= greatest(lit(1), (col("n") - ceil(col("n") * lit(tEff) - lit(1e-9)) + 1).cast("int")))
      .select(col("doc_id").as("a_id"), col("sh"))
    val fullPost = post.select(col("doc_id").as("b_id"), col("sh"))
    val prefixCand = prefLen.join(fullPost, "sh")
      .where(col("a_id") =!= col("b_id")).select("a_id", "b_id").distinct().count()
    val fullCand = post.select(col("doc_id").as("a_id"), col("sh"))
      .join(fullPost, "sh")
      .where(col("a_id") =!= col("b_id")).select("a_id", "b_id").distinct().count()
    val coocRows = post.select(col("doc_id").as("a_id"), col("sh"))
      .join(fullPost, "sh").where(col("a_id") =!= col("b_id")).count()
    println(s"PROBE7 x76 prefix_candidates=$prefixCand full_candidates=$fullCand cooc_rows=$coocRows " +
      f"ratio=${coocRows.toDouble / prefixCand}%.1f")

    // --- x82 candidate mass with vs without the degree cap ---
    val e = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("l"), col("l_partkey").as("r"))
      .distinct().persist()
    val deg = e.groupBy("r").agg(count(lit(1)).as("d")).persist()
    def pairMass(cap: Int): Long = deg
      .where(col("d") <= cap)
      .agg(sum(expr("d * (d - 1) div 2"))).collect()(0).getLong(0)
    val capped = pairMass(40)
    val uncapped = pairMass(Int.MaxValue)
    val nHub = deg.where(col("d") > 40).count()
    println(s"PROBE7 x82 pair_rows_cap40=$capped pair_rows_uncapped=$uncapped hubs_excluded=$nHub " +
      f"hub_mass_pct=${100.0 * (uncapped - capped) / uncapped}%.1f")
    spark.stop()
  }
}
