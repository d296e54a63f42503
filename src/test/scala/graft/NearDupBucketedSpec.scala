package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The 100 TB claim behind x75's persisted index, made a PLAN property
  * (r11 verdict #3): written bucketed by its join keys, the index artifact
  * must serve a delivery's classification with NO shuffle of any raw index
  * frame — every join consumes the index scan at its bucket partitioning,
  * and the only exchanges in the tree move DELIVERY data (or join output,
  * which is delivery-sized under the delivery ≪ index precondition).
  *
  * Pinned with AQE off (the exchange tree is inspectable; AQE can only
  * rewrite exchanges that are planned, never add one to a side that
  * already satisfies the join's required distribution) and with the
  * broadcast threshold disabled: at spec scale CBO would otherwise
  * broadcast the tiny index frames — exactly the choice a 100 TB index
  * forbids — so disabling it forces the sort-merge path where the bucket
  * is load-bearing. The explicit `broadcast(dPrefix)` delivery hint in
  * [[Dedup.incrementalClassifyIndexed]] survives the threshold (hints
  * override it), which is itself part of the pinned shape.
  */
class NearDupBucketedSpec extends SparkSpec {

  private val prefix = "graft_ndidx_spec"
  private val tables =
    Seq(s"${prefix}_digests", s"${prefix}_lookup", s"${prefix}_arrays", s"${prefix}_prefixes")

  /** Children, descending THROUGH plan boundaries that hide subtrees:
    * cached relations (the operator persists its delivery frames) and
    * adaptive wrappers (cache entries built while AQE was on).
    */
  private def expand(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case im: InMemoryTableScanExec => Seq(im.relation.cachedPlan)
    case other => other.children
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: expand(p).flatMap(allNodes)

  private def isIndexScan(p: SparkPlan): Boolean = p match {
    case f: FileSourceScanExec => f.tableIdentifier.exists(t => tables.contains(t.table))
    case _ => false
  }

  /** True when `p` reaches a raw index scan without crossing a join — the
    * signature of an index frame being re-shuffled (an exchange above a
    * JOIN's output moves already-joined, delivery-sized rows; that is the
    * allowed shape).
    */
  private def reachesRawIndexScan(p: SparkPlan): Boolean = p match {
    case f: FileSourceScanExec => isIndexScan(f)
    case _: BaseJoinExec => false
    case other => expand(other).exists(reachesRawIndexScan)
  }

  test("bucketed index artifact: no raw index frame shuffles, joins read the buckets, result ≡ in-memory index") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // the x75 split: index = ids < 250, delivery = the rest plus planted
    // exact duplicates of low-id index docs
    val index = docs.where(col("doc_id") < 250)
    val delivery = docs.where(col("doc_id") >= 250)
      .unionAll(docs.where(col("doc_id") < 20)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))

    val mem = Dedup.buildNearDupIndex(index, n = 3, threshold = 0.5)
    try {
      Dedup.writeNearDupIndexBucketed(mem, buckets = 4, prefix = prefix)
      val disk = Dedup.loadNearDupIndexBucketed(spark, n = 3, threshold = 0.5, prefix = prefix)

      val expected = Dedup.incrementalClassifyIndexed(delivery, mem)
        .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet

      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (got, plan) =
        try {
          val out = Dedup.incrementalClassifyIndexed(delivery, disk)
          val rows = out.collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
          (rows, out.queryExecution.executedPlan)
        } finally {
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        }

      // correctness: the on-disk artifact classifies identically
      assert(got === expected)
      assert(got.nonEmpty && got.exists(_._2 == "exact") && got.exists(_._2 == "novel"))

      val nodes = allNodes(plan)
      // plan pin 1: no shuffle exchange feeds off a raw index scan — the
      // index never moves; only delivery frames (and delivery-sized join
      // outputs) are exchanged
      val offending = nodes.collect {
        case e: ShuffleExchangeExec if reachesRawIndexScan(e.child) => e
      }
      assert(
        offending.isEmpty,
        s"raw index frame re-shuffled:\n${offending.mkString("\n\n")}")
      // plan pin 2: the index is actually read through its buckets (the
      // sort-merge joins consume the scans' bucket partitioning directly)
      val idxScans = nodes.collect { case f: FileSourceScanExec if isIndexScan(f) => f }
      assert(idxScans.nonEmpty, s"no index-table scans found in plan:\n$plan")
      assert(
        idxScans.forall(_.bucketedScan),
        s"non-bucketed index scan:\n${idxScans.filterNot(_.bucketedScan).mkString("\n")}")
    } finally {
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      mem.unpersistAll()
    }
  }
}
