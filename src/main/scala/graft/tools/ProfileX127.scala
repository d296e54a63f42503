package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.LinearModel

/** Dev probe: where does x127's wall go? Times each stage of the
  * learned-screen curation in isolation at a given SF.
  */
object ProfileX127 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val model = LinearModel.planted("q", 2, 512)
    val docs = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)

    def time(name: String)(body: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = body
        println(f"PROF $name rep$i n=$n wall=${(System.nanoTime() - t0) / 1e9}%6.2f")
      }
    }

    time("classify.count")(LinearModel.classify(docs, "text", model).count())
    time("classify.pred.filter") {
      LinearModel.classify(docs, "text", model).where(col("pred") === 1L).count()
    }
    time("modelScreened") {
      LinearModel.modelScreened(docs, model, 1L).count()
    }
    time("curateWithModel") {
      LinearModel.curateWithModel(docs, model, 1L, 10).count()
    }
    spark.stop()
  }
}
