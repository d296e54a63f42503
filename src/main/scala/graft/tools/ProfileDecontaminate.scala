package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.GraftFunctions
import graft.operators.{Decontaminate, TextAnalysis}

/** Stage-by-stage profiling of the decontamination operators (dev tool):
  * where do the ~18 CPU-seconds of x16/x21 at sf0.1 actually go —
  * shingling, the explode, the join, or the rollup?
  */
object ProfileDecontaminate {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "profile-decontaminate")
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.where(col("doc_id") % 50 =!= 0)
    val evalSet = docs.where(col("doc_id") % 50 === 0)

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time(name: String)(f: => Long): Unit = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"PROF $name%-28s wall=$wall%8.2f s cpu=$cpu%8.2f s  rows=$n")
    }

    // raw scan baseline
    time("scan-only")(corpus.count())

    // tokens only (split cost)
    time("tokens")(
      corpus.select(size(TextAnalysis.tokens(col("text"))).as("n")).agg(sum("n")).count()
    )

    // shingle build (transform/concat_ws/array_distinct on top of tokens)
    val sh = corpus.select(
      col("doc_id"),
      TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3).as("sh")
    )
    time("shingles agg")(sh.select(sum(size(col("sh")))).count())

    // explode to postings
    val grams = sh.select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"),
      explode(col("sh")).as("gram"))
    time("postings")(grams.count())
    time("postings again")(grams.count())

    // variant: explode without the sibling size() reference
    time("postings no-size")(sh.select(col("doc_id"), explode(col("sh")).as("gram")).count())

    // variant: shingle array persisted first, explode reads the cache
    val shP = sh.persist()
    time("sh persist")(shP.count())
    time("postings from cache")(
      shP.select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"),
        explode(col("sh")).as("gram")).count()
    )
    shP.unpersist()

    // eval gram set
    val ev = evalSet
      .select(explode(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)).as("gram"))
      .distinct()
    time("eval grams")(ev.count())

    // broadcast join + rollup = the rest of x16
    time("x16 full")(Decontaminate.overlap(corpus, evalSet, 3).count())
    time("x16 again")(Decontaminate.overlap(corpus, evalSet, 3).count())

    time("x21 full")(
      Decontaminate.overlapBloom(corpus, evalSet, 3, expectedGrams = 10000L).count()
    )

    spark.stop()
  }
}
