package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Dump q13's final AQE plan and operator-level SQL metrics (dev tool). */
object ProfileQ13Plan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "profile-q13-plan")
    val df = SparkEntry.queries("q13_options_pipeline")(spark, dir)
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"EXEC ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    val plan = df.queryExecution.executedPlan.toString
    println("=== final plan (WSCG spans marked with *) ===")
    println(plan.linesIterator.map(_.take(140)).mkString("\n"))
    spark.stop()
  }
}
