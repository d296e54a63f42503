package graft.tools

import graft.{GraftSession, SparkEntry}

/** Min-of-N wall/CPU for a comma-separated list of registered queries in
  * ONE JVM (dev tool — amortizes sbt/session startup across the targeted
  * re-measurements of an optimization round; the committed number of
  * record stays Bench.scala's).
  * Usage: runMain graft.tools.BenchSome <q1,q2,...> [sfDir] [reps]
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 4
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      val runs = (1 to reps).map { _ =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
      }
      val best = runs.minBy(_._1)
      println(f"BENCHSOME $name min_wall=${best._1}%7.3f min_cpu=${best._2}%7.2f " +
        f"walls=${runs.map(r => f"${r._1}%.2f").mkString(",")} cpus=${runs.map(r => f"${r._2}%.1f").mkString(",")}")
    }
    spark.stop()
  }
}
