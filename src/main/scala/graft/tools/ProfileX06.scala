package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.GraftSession
import graft.functions.GraftFunctions
import graft.operators.Dedup

object ProfileX06 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "profile-x06")
    GraftFunctions.register(spark)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {
          s <- si.submissionTime; e <- si.completionTime
        } yield (e - s) / 1000.0
        println(
          f"STAGE ${si.stageId}%3d ${dur.getOrElse(-1.0)}%8.2f s  tasks=${si.numTasks}%5d  ${si.name.take(80)}")
      }
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val q = Dedup.ngramJaccardPairs(docs, 3, 0.5)
    q.explain("formatted")
    val t0 = System.nanoTime()
    println("ROWS=" + q.count())
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
