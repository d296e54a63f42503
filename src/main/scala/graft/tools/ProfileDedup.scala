package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.GraftFunctions
import graft.operators.{Dedup, TextAnalysis}

/** Stage-by-stage profiling of the near-dup operators (dev tool). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "profile-dedup")
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val sh = Dedup.withShingles(docs, 3).withColumn("sh_size", size(col("sh")))
    time("shingles")(sh.count())
    val postings = sh.select(col("doc_id"), col("sh_size"), explode(col("sh")).as("shingle"))
    time("postings")(postings.count())
    val pruned = postings
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .where(col("df") <= 1000)
      .drop("df")
    time("pruned")(pruned.count())
    val a = pruned.select(col("doc_id").as("a_id"), col("sh_size").as("a_size"), col("shingle"))
    val b = pruned.select(col("doc_id").as("b_id"), col("sh_size").as("b_size"), col("shingle"))
    val joined = a.join(b, Seq("shingle")).where(col("a_id") < col("b_id"))
    time("self-join")(joined.count())
    val grouped = joined
      .groupBy(col("a_id"), col("b_id"), col("a_size"), col("b_size"))
      .agg(count(lit(1)).as("common"))
    time("grouped")(grouped.count())
    time("x06 full")(Dedup.ngramJaccardPairs(docs, 3, 0.5).count())

    val sig = sh.where(size(col("sh")) > 0)
      .select(col("doc_id"), GraftFunctions.minhashSig(col("sh"), 128).as("sig"))
    time("minhash sigs")(sig.count())
    time("x07 full")(Dedup.minhashLshPairs(docs, 3, 0.5, 32, 4).count())

    spark.stop()
  }
}
