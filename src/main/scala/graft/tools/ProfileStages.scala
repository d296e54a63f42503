package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{
  SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.{GraftSession, SparkEntry}

/** Per-stage wall/CPU attribution for ONE registered query (optimization
  * round dev tool, guide §1/§7): runs the query with a listener that
  * records, per completed stage, the stage name (callsite), task count,
  * executor run/CPU time, shuffle bytes, and the submission gaps —
  * answering "where does the wall go" (task compute vs scheduling gaps
  * vs driver-only work) without the UI.
  *
  * Usage: runMain graft.tools.ProfileStages <query> [sfDir] [reps]
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    final case class StageRow(
        jobId: Int, stageId: Int, name: String, tasks: Int,
        wallMs: Long, runMs: Long, cpuMs: Long,
        shufReadMB: Double, shufWriteMB: Double, submitted: Long, completed: Long)
    val stages = new ConcurrentLinkedQueue[StageRow]()
    val jobs = new ConcurrentLinkedQueue[(Int, Long, String)]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.add((js.jobId, js.time,
          Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")))
        js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(StageRow(
          stageToJob.getOrDefault(si.stageId, -1),
          si.stageId, si.name, si.numTasks,
          (for {c <- si.completionTime; s <- si.submissionTime} yield c - s)
            .getOrElse(-1L),
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          si.submissionTime.getOrElse(-1L), si.completionTime.getOrElse(-1L)))
      }
    })

    val q = SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      stages.clear(); jobs.clear()
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      if (rep == reps) {
        import scala.jdk.CollectionConverters._
        val rows = stages.asScala.toSeq.sortBy(_.submitted)
        println(f"\n==== $name rep$rep wall=$wall%.3f s ====")
        println(f"${"job"}%4s ${"stage"}%5s ${"tasks"}%5s ${"wall_ms"}%8s " +
          f"${"run_ms"}%8s ${"cpu_ms"}%8s ${"shR_MB"}%7s ${"shW_MB"}%7s  name")
        rows.foreach { r =>
          println(f"${r.jobId}%4d ${r.stageId}%5d ${r.tasks}%5d ${r.wallMs}%8d " +
            f"${r.runMs}%8d ${r.cpuMs}%8d ${r.shufReadMB}%7.1f ${r.shufWriteMB}%7.1f  ${r.name.take(90)}")
        }
        // gap analysis: time not covered by any running stage = driver-side
        val spans = rows.filter(r => r.submitted > 0 && r.completed > 0)
          .map(r => (r.submitted, r.completed)).sortBy(_._1)
        val covered = spans.foldLeft((0L, 0L, 0L)) { case ((cov, end, _), (s, e)) =>
          val start = math.max(s, end)
          (cov + math.max(0L, e - start), math.max(end, e), 0L)
        }._1
        val span = if (spans.nonEmpty) spans.map(_._2).max - spans.map(_._1).min else 0L
        println(f"stage-covered span: $covered ms of $span ms job-window " +
          f"(${wall * 1000}%.0f ms wall total; rest = driver/planning/gaps)")
        println(s"jobs: ${rows.map(_.jobId).distinct.size}, stages: ${rows.size}, " +
          f"sum(stage wall)=${rows.map(_.wallMs).sum} ms, sum(run)=${rows.map(_.runMs).sum} ms, " +
          f"sum(cpu)=${rows.map(_.cpuMs).sum} ms")
      }
    }
    spark.stop()
  }
}
