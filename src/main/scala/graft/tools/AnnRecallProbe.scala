package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity

/** Parameter probe for the driver-visible ANN contracts: for each SF and
  * candidate config, does the bucketed path return EXACTLY the brute-force
  * top-k (same (query, neighbor, rank) triples)? A config that matches at
  * every tested SF can carry the x09-shaped DuckDB oracle — recall and
  * ranking are then pinned by the driver, not just by specs.
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 16, appName = "ann-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.where(col("vec_id") < 10)
      val c = emb.where(col("vec_id") >= 10)
      val exact = key(Similarity.bruteForceTopK(q, c, 5))
      for (nprobe <- Seq(13, 14, 15, 16)) {
        val ivf = key(Similarity.ivfTopK(q, c, 5, nlist = 16, nprobe = nprobe))
        println(s"$sf ivf nprobe=$nprobe match=${ivf == exact} overlap=${(ivf & exact).size}/${exact.size}")
      }
      // the sweep behind x10's registered config: the 48-table candidate
      // cover (and the 32-table margin / 16-table shortfall it is quoted
      // against) must be re-runnable from the repo, not folklore
      for (tables <- Seq(16, 32, 48)) {
        val lsh = key(Similarity.lshTopK(q, c, 5, tables = tables, bitsPerTable = 4))
        println(s"$sf lsh tables=$tables match=${lsh == exact} overlap=${(lsh & exact).size}/${exact.size}")
      }
    }
    spark.stop()
  }

  private def key(df: DataFrame): Set[(Long, Long, Int)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
}
