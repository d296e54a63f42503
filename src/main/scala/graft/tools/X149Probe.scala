package graft.tools
object X149Probe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "sf0.001"
    val spark = graft.GraftSession.local(appName = "x149probe")
    val df = graft.SparkEntry.queries("x149_arc_funnel")(spark, s"/root/testdata/$sf")
    df.show(10, false)
    df.write.mode("overwrite").parquet(s"/tmp/x149_out_$sf")
    val w = new java.io.PrintWriter(s"/tmp/x149_oracle_$sf.sql")
    w.write(graft.SparkEntry.oracleSql("x149_arc_funnel")); w.close()
    println("WROTE " + sf)
    spark.stop()
  }
}
