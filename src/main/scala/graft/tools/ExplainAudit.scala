package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Dump formatted physical plans for selected queries (dev tool) — the
  * audit trail for the scale claims: pushed filters, broadcast joins,
  * whole-stage codegen spans, single source scan per batch.
  * Usage: runMain graft.tools.ExplainAudit [sfDir] [query...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(8, "explain-audit")
    names.foreach { n =>
      println(s"\n======== $n ========")
      val df = SparkEntry.queries(n)(spark, dir)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
