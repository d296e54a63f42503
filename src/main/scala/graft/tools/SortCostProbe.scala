package graft.tools

import org.apache.spark.sql.catalyst.plans.logical._

import graft.{GraftSession, SparkEntry}

/** Flags queries whose final global Sort sits directly on an
  * UNMATERIALIZED subtree (no shuffle/aggregate boundary between the
  * sort's range exchange and the expensive compute): for those, the
  * range-partitioner's boundary-sampling job re-executes the whole
  * subtree — the query pays its map-side compute twice (guide §1.1
  * first-principles pass count). Walks the optimized logical plan; no
  * execution.
  *
  * Usage: runMain graft.tools.SortCostProbe [sfDir]
  */
object SortCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(8, "sort-cost-probe")
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        plan match {
          case Sort(_, true, child, _) =>
            // walk until a node that plans its own exchange (agg, window,
            // repartition, global limit) or a leaf; collect what the
            // sampling job would re-run
            var cur: LogicalPlan = child
            var materialized = false
            var hasJoin = false
            var hasGenerate = false
            var projExprs = 0
            var leaf = "?"
            var done = false
            while (!done) cur match {
              case _: Aggregate | _: Window | _: Repartition |
                  _: RepartitionByExpression | _: GlobalLimit | _: Distinct =>
                materialized = true; done = true
              case j: Join =>
                hasJoin = true
                // continue down the larger/streamed side is unknowable
                // statically; walk left (the conventional streamed side)
                cur = j.left
              case g: Generate =>
                hasGenerate = true; cur = g.child
              case p: Project =>
                projExprs += p.projectList.map(_.collect { case e => e }.size).sum
                cur = p.child
              case u: UnaryNode => cur = u.child
              case l =>
                leaf = l.getClass.getSimpleName; done = true
            }
            if (!materialized)
              println(s"UNMAT $name leaf=$leaf join=$hasJoin gen=$hasGenerate exprNodes=$projExprs")
          case _ => // no global sort at root
        }
      } catch {
        case e: Throwable => println(s"ERR $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
