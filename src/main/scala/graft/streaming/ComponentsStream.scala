package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.Cluster

/** Incremental connected components over an unbounded EDGE stream — the
  * graph member of the batch/stream twin program (the tenth twin, and the
  * first whose state is a whole graph summary rather than per-key
  * scalars): near-dup pair miners (x06/x07/x11) run continuously at
  * ingest, and the component labels that drive dedup keep/drop decisions
  * (x14/x71/x81) must stay current without re-clustering the full
  * history.
  *
  * Per-key `flatMapGroupsWithState` cannot express this — connectivity is
  * GLOBAL (one new edge can merge components whose members share no key)
  * — so the twin is a checkpointed `foreachBatch` maintainer, the
  * [[PipelineStream]] shape: each micro-batch folds its new edges into a
  * maintained (id, comp) labels table.
  *
  * THE STAR INVARIANT (why incremental ≡ batch, exactly): a maintained
  * labels table is re-entered as its STAR GRAPH — one edge (id → comp)
  * per non-root member. Star edges preserve the connectivity partition of
  * everything folded so far, and the node set of the star graph is the
  * node set of the history (every root appears as some member's comp, or
  * is carried explicitly if its component is a singleton), so
  *
  *   CC(star(labels_{i−1}) ∪ edges_i) = CC(edges_1 ∪ … ∪ edges_i)
  *
  * as a partition — and since component labels are MINIMUM NODE IDS and
  * star edges introduce no new nodes, the labels agree too. That identity
  * IS the prefix-equality contract the other nine twins carry, and
  * ComponentsStreamSpec pins it after every micro-batch.
  *
  * State size: |nodes| rows — the same frame batch CC materializes, never
  * the edge history. Per batch the work is one batch-CC run over
  * (star edges + the DELTA's edges): O(current nodes + new edges) per
  * round, with round count bounded by the MERGED graph's diameter — which
  * collapses toward 2 as the maintained side is always star-shaped (the
  * re-cluster-from-scratch alternative pays the full history's edge count
  * every batch AND its original diameter). Labels are localCheckpoint'd
  * (truncated lineage, the §8.9 rule) so batch i's plan does not re-plan
  * batches 1..i−1.
  */
object ComponentsStream {

  final case class Edge(a_id: Long, b_id: Long)

  private val labelSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("comp", LongType, nullable = false)))

  /** The maintained labels table + the fold. Thread-safe for the one
    * writer (the streaming engine's foreachBatch) + many readers.
    */
  final class Maintainer(spark: SparkSession) {
    @volatile private var labels: DataFrame =
      spark.createDataFrame(new java.util.ArrayList[Row](), labelSchema)

    /** Current (id, comp) snapshot — after batch i, ≡ batch CC over every
      * edge of batches 1..i (plus self-loop singletons).
      */
    def current: DataFrame = labels

    /** Fold one micro-batch of edges into the labels. */
    private[streaming] def update(newEdges: DataFrame): Unit = {
      val star = labels
        .where(col("id") =!= col("comp"))
        .select(col("id").as("a_id"), col("comp").as("b_id"))
      val all = star.unionByName(
        newEdges.select(col("a_id").cast(LongType), col("b_id").cast(LongType)))
      val comps = Cluster.connectedComponents(all)
      // a SINGLETON component (a self-loop-only node) has no star edge —
      // carry its root row forward explicitly unless the new edges
      // re-touched it
      val carried = labels
        .where(col("id") === col("comp"))
        .join(comps.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("comp"))
      labels = comps.unionByName(carried).localCheckpoint(true)
    }
  }

  /** Start the maintainer over a streaming Dataset[Edge]. The returned
    * query drives `maintainer.update` once per micro-batch; read
    * `maintainer.current` between batches for the live labels.
    */
  def start(
      edges: Dataset[Edge],
      maintainer: Maintainer,
      checkpoint: Option[String] = None,
      // a LONG-RUNNING maintainer by default (AvailableNow would fold
      // what exists at start and terminate — right for backfill, wrong
      // for the live-labels contract)
      trigger: Trigger = Trigger.ProcessingTime(0L)
  ): StreamingQuery = {
    val writer = edges.toDF.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        maintainer.update(batch.toDF())
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }
}
