package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.LinearModel

/** Incremental model training over an unbounded labeled-document
  * stream — the SEVENTEENTH batch/stream twin, and the learned-model
  * family's streaming member: x128's integer batch perceptron stays
  * current as labeled examples land, the continuous-learning loop a
  * production curation stack runs (annotators/weak labels arrive daily;
  * the quality screen retrains and the NEXT delivery is scored by the
  * refreshed model — Wenzek et al. 2019 retrain CCNet's scorer per
  * crawl snapshot for exactly this reason).
  *
  * State is ONE frame: the distinct labeled training set
  * (doc_id, text, y) — exactly what the trainer consumes; feature
  * counts, scores, and updates derive from it inside
  * [[LinearModel.trainPerceptron]], so nothing in state can drift from
  * the examples across restarts.
  *
  * The fold is union + distinct keyed by the full row: the per-batch
  * DELTA is the batch's own distinct rows (recomputed from the batch
  * alone — NOT an anti-join against state — so a replayed batch after a
  * failed save re-derives the identical delta), and the distinct merge
  * collapses replayed rows instead of duplicating them: the idempotent
  * fold the EpochStore crash matrix requires. Durable state advances
  * save-first (compute → persist → swap), the FuzzyStream ordering
  * discipline.
  *
  * EMISSION IS VIEW-FORCED — the PageRankStream end of the taxonomy,
  * for the same structural reason: the batch perceptron's round-r
  * update sums over ALL misclassified examples, so one new example can
  * flip a round-1 score sign and move EVERY later-round weight — no
  * per-batch weight rows could stand once the next batch lands. The
  * only honest shape is state-is-the-artifact, weights-are-queries:
  * `weights()` runs the batch twin's OWN
  * [[LinearModel.trainPerceptron]] (fixed integer rounds, synchronous
  * updates, bit-identical, engine-portable) over current state — stream
  * ≡ batch by shared code, not a parallel reimplementation. This is
  * deliberately NOT an online/sequential perceptron: the sequential
  * update's result depends on row order, which no replayed, repartitioned
  * stream can reproduce; the batch formulation is the one that admits a
  * stream twin at all.
  *
  * RESTART SAFETY — the [[DeltaEpochStore]] contract (the training set
  * GROWS with the stream, so full-frame persistence would write
  * O(corpus) per micro-batch): per-epoch deltas (data first, marker
  * second), compaction every K, loader re-applies the same distinct
  * merge over compact + deltas. `start()` refuses a checkpoint without
  * a stateDir unless `allowVolatileState = true` (a restart would train
  * on a silently partial corpus).
  *
  * 100 TB shape: the fold is one row-keyed distinct per batch (delta
  * tiny against state); each training query is x128's audited plan —
  * the per-doc bucket-count table built once and persisted, one
  * doc-keyed score aggregation + one broadcast of the misclassified ids
  * + one bucket-keyed delta aggregation per round, weights bounded
  * driver state (dim longs, the k-means-codebook contract).
  */
object PerceptronStream {

  final case class Example(doc_id: Long, text: String, y: Long)

  private val examplesSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("y", LongType)))

  final class Maintainer(
      spark: SparkSession,
      val stateDir: Option[String] = None,
      compactEvery: Int = 8
  ) {

    private val store: Option[DeltaEpochStore] =
      stateDir.map(new DeltaEpochStore(spark, _, Seq("examples" -> examplesSchema), compactEvery))

    @volatile private var examples: DataFrame = store
      .flatMap(_.load())
      // raw compact+delta union → the same distinct merge the fold uses
      .map(m => m("examples").distinct().localCheckpoint(true))
      .getOrElse(EpochStore
        .emptyFrames(spark, Seq("examples" -> examplesSchema))
        .apply("examples"))

    /** True iff construction reloaded a persisted epoch (restart path). */
    def resumed: Boolean = store.exists(_.latestCommitted >= 0)

    /** The live distinct labeled training set folded so far. */
    def state: DataFrame = examples

    /** Current trained weights over everything folded so far — the batch
      * twin's output through the batch twin's own trainer (view-forced
      * emission; see the scaladoc taxonomy note). Returns the dense
      * dim-long weight vector plus the per-round misclassified counts
      * (the training curve, x128's audit signal).
      */
    def train(dim: Int = 512, rounds: Int = 3): (Array[Long], Seq[Long]) =
      LinearModel.trainPerceptron(examples, "text", "y", dim = dim, rounds = rounds)

    private[graft] def update(batch: DataFrame, epochId: Long = -1L): Unit = {
      // delta from the batch ALONE: replay after a failed save re-derives
      // the identical rows, and the distinct merge collapses them
      val delta = batch
        .select(
          col("doc_id").cast(LongType),
          col("text").cast(StringType),
          col("y").cast(LongType))
        .distinct()
        .localCheckpoint(true)
      val newExamples = examples.unionByName(delta).distinct().localCheckpoint(true)
      // save BEFORE the in-memory swap (the FuzzyStream ordering): a
      // failed save leaves pre-batch state, and the replayed epoch
      // recommits the same delta
      store.foreach(_.save(epochId, Map("examples" -> delta), Map("examples" -> newExamples)))
      examples = newExamples
    }
  }

  /** Start the maintainer over a streaming Dataset[Example]; call
    * `maintainer.train()` between batches for the live model.
    */
  def start(
      stream: Dataset[Example],
      maintainer: Maintainer,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      allowVolatileState: Boolean = false
  ): StreamingQuery = {
    require(
      checkpoint.isEmpty || maintainer.stateDir.nonEmpty || allowVolatileState,
      "checkpointLocation set but the Maintainer has no stateDir: a restart " +
        "would skip committed batches against an empty training set and " +
        "train on a silently partial corpus. Pass a stateDir (persisted " +
        "state) or allowVolatileState = true if the checkpoint is known fresh.")
    val writer = stream.toDF.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        maintainer.update(batch.toDF(), epochId)
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }
}
