package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.GraftFunctions
import graft.operators.Similarity

/** Dev tool: measure IVF recall vs exact top-k at sf0.001 and emit the
  * golden fixture CSV for SimilaritySpec (same role as the x10 pin).
  * Usage: runMain graft.tools.DevIvfGolden [outPath]
  */
object DevIvfGolden {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "dev-ivf")
    GraftFunctions.register(spark)
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where($"vec_id" < 10)
    val c = emb.where($"vec_id" >= 10)
    val exact = Similarity.bruteForceTopK(q, c, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactly the x13 query parameters
    val ivf = Similarity.ivfTopK(q, c, 5, nlist = 16, nprobe = 8)
      .orderBy($"query_id", $"rank").collect()
    val approx = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"IVF recall vs exact: ${(exact & approx).size.toDouble / exact.size}")
    args.headOption.foreach { out =>
      val lines = "query_id,neighbor_id,score,rank" +: ivf.toSeq
        .map(r => f"${r.getLong(0)},${r.getLong(1)},${r.getDouble(2)}%.6f,${r.getInt(3)}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out),
        lines.mkString("\n").getBytes("UTF-8")
      )
      println(s"wrote ${lines.size - 1} golden rows to $out")
    }
    spark.stop()
  }
}
