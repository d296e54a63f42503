package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query gets one untimed warm-up execution first (whole-stage codegen
  * compilation + JIT warm-up are per-query one-off costs that a steady-state
  * throughput number should exclude), then one timed run. Failures are
  * logged to stderr and reported as -1 so a broken query is visible instead
  * of masquerading as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    qs.foreach { case (name, fn) =>
      try fn(spark, sfDir).count()
      catch {
        case e: Throwable => System.err.println(s"[bench][warmup] $name failed: ${e.getMessage}")
      }
    }
    val results = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val queriesJson = results
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$queriesJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
