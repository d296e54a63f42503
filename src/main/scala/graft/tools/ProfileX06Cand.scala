package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftSession
import graft.operators.{Dedup, TextAnalysis}

/** One-off instrumentation of the x06 candidate pipeline (dev tool):
  * counts postings, prefix-index size, candidate pairs, and verified
  * pairs at a given SF, to keep the prefix-filtering scaladoc honest.
  */
object ProfileX06Cand {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "profile-x06-cand")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t = 0.5
    val tEff = t - 1e-6

    val sh = docs
      .select(col("doc_id"), TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val postings = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val dfCounts = postings.groupBy("shingle").agg(count(lit(1)).as("df"))
    val kept = postings.join(
      broadcast(dfCounts.where(col("df") > 1000).select("shingle")), Seq("shingle"), "left_anti")
    val ordered = kept
      .join(dfCounts, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("shingle")))).as("dsh"))
      .select(
        col("doc_id"),
        transform(col("dsh"), x => x.getField("shingle")).as("osh"),
        size(col("dsh")).as("sh_size"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val prefix = ordered.select(
      col("doc_id"),
      explode(slice(col("osh"), lit(1),
        greatest(lit(1),
          (col("sh_size") - ceil(col("sh_size") * lit(tEff) - lit(1e-9)) + 1).cast("int"))))
        .as("shingle"))
    val candidates = prefix
      .select(col("doc_id").as("a_id"), col("shingle"))
      .join(prefix.select(col("doc_id").as("b_id"), col("shingle")), Seq("shingle"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
    println("postings=" + postings.count())
    println("kept=" + kept.count())
    println("prefix_index=" + prefix.count())
    val t0 = System.nanoTime()
    println("cand_multi=" + candidates.count())
    println("cand_distinct=" + candidates.distinct().count())
    println(f"cand_time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    // co-occurrence volume of the FULL kept index (the old algorithm's
    // quadratic work): sum over shingles of df_kept^2
    val full = kept.groupBy("shingle").agg(count(lit(1)).as("d"))
      .agg(sum(col("d") * col("d"))).collect()(0).getLong(0)
    println("full_coocc=" + full)
    spark.stop()
  }
}
