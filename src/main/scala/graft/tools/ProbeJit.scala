package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Attribute per-rep JIT cost for one query (dev tool): per rep, the JVM
  * JIT-compile delta, classes-loaded delta, and Janino codegen-cache
  * behaviour via CodegenMetrics (generated-class compile COUNT grows only
  * on a codegen-cache MISS — a cache-hit plan loads zero new classes and
  * pays zero HotSpot re-JIT). Distinguishes "the mega-plan's generated
  * code is recompiled every rep" (compiledCount grows per rep) from "the
  * code is cache-hit but HotSpot deoptimizes/re-JITs" (jit grows, count
  * flat).
  *
  * Usage: runMain graft.tools.ProbeJit [sfDir] [query] [n]
  */
object ProbeJit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "x44_cluster_canonical"
    val n = if (args.length > 2) args(2).toInt else 4
    val spark = GraftSession.local(32, "probe-jit")
    spark.sparkContext.setLogLevel("ERROR")
    val comp = java.lang.management.ManagementFactory.getCompilationMXBean
    val cls = java.lang.management.ManagementFactory.getClassLoadingMXBean
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    (1 to n).foreach { i =>
      val j0 = comp.getTotalCompilationTime
      val l0 = cls.getTotalLoadedClassCount
      val cc0 = cg.METRIC_COMPILATION_TIME.getCount // Janino compiles (cache misses)
      val ct0 = cg.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"RUN $i wall=$wall%6.2f jit=${(comp.getTotalCompilationTime - j0) / 1e3}%6.2f" +
        f" classes=+${cls.getTotalLoadedClassCount - l0}%-6d" +
        f" janinoCompiles=+${cg.METRIC_COMPILATION_TIME.getCount - cc0}%-4d" +
        f" janinoMsTot=${(cg.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum - ct0)}%d")
    }
    spark.stop()
  }
}
