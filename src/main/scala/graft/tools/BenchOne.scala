package graft.tools
import graft.{GraftSession, SparkEntry}
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"BENCHONE $name rep$i wall=${(System.nanoTime() - t0) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
