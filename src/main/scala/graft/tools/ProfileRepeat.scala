package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Repeat one query N times to expose run-over-run degradation (dev tool).
  * Usage: runMain graft.tools.ProfileRepeat [sfDir] [query] [n] [clearCache]
  */
object ProfileRepeat {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "q13_options_pipeline"
    val n = if (args.length > 2) args(2).toInt else 4
    val clear = args.length > 3 && args(3) == "clear"
    val spark = GraftSession.local(32, "profile-repeat")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    (1 to n).foreach { i =>
      if (clear) spark.catalog.clearCache()
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      // noop write, not count(): count() lets Catalyst prune the very
      // projections being profiled (the Bench fidelity lesson)
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(
        f"RUN $i wall=${(System.nanoTime() - t0) / 1e9}%7.2f cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%7.2f clear=$clear")
    }
    spark.stop()
  }
}
