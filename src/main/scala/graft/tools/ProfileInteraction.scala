package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Reproduces the Bench-order interaction: heavy queries first, then x06.
  * Usage: runMain graft.tools.ProfileInteraction [sfDir] [query...]
  */
object ProfileInteraction {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("x11_embed_neardup", "x10_ann_lsh", "x06_ngram_jaccard", "x07_minhash_lsh")
    val spark = GraftSession.local(32, "profile-interaction")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for { s <- si.submissionTime; e <- si.completionTime } yield (e - s) / 1000.0
        val m = si.taskMetrics
        if (dur.exists(_ > 2.0) || m.executorCpuTime / 1e9 > 2.0)
          println(
            f"SLOWSTAGE ${si.stageId}%3d ${dur.get}%8.2f s tasks=${si.numTasks} " +
              f"cpu=${m.executorCpuTime / 1e9}%7.2f run=${m.executorRunTime / 1e3}%7.2f " +
              f"in=${m.inputMetrics.recordsRead}%8d sh=${m.shuffleReadMetrics.recordsRead}%8d " +
              si.details.linesIterator.take(3).mkString(" | "))
      }
    })
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      val tPlan = System.nanoTime()
      val rows = df.count()
      println(
        f"PROF $n%-24s plan=${(tPlan - t0) / 1e9}%6.2f exec=${(System.nanoTime() - tPlan) / 1e9}%8.2f s rows=$rows")
    }
    spark.stop()
  }
}
