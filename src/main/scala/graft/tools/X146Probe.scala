package graft.tools

/** x146 dev probe: times the composed web arc at a given SF (3 reps),
  * dumps the result + oracle SQL for a direct DuckDB diff, and prints
  * the post-cut plan's FileScan count (must be 0 — the lineage-cut
  * posture WebArcSpec pins; before the cuts the composed join tree
  * carried 8676 scan nodes and planning alone cost ~20 s per job).
  */
object X146Probe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "sf0.1"
    val spark = graft.GraftSession.local(appName = "x146probe")
    def run(): Unit = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("x146_web_arc")(spark, s"/root/testdata/$sf").collect().length
      println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    run(); run(); run()
    val df = graft.SparkEntry.queries("x146_web_arc")(spark, s"/root/testdata/$sf")
    df.write.mode("overwrite").parquet(s"/tmp/x146_out_$sf")
    val w = new java.io.PrintWriter(s"/tmp/x146_oracle_$sf.sql")
    w.write(graft.SparkEntry.oracleSql("x146_web_arc")); w.close()
    val plan = df.queryExecution.executedPlan.toString
    println("SCANS=" + "FileScan parquet".r.findAllIn(plan).length)
    spark.stop()
  }
}
