package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.Preference

/** Live Bradley-Terry ratings over an unbounded pairwise-preference
  * stream — the EIGHTEENTH batch/stream twin, and the preference
  * family's (x136) streaming member: arena-style leaderboards and RLHF
  * preference collection are continuous processes (every day's human or
  * judge-model comparisons should move the board), not batch jobs over
  * a frozen log.
  *
  * State is ONE frame: the distinct comparison EVENT set
  * (cmp_id, item_a, item_b, winner). The event id is load-bearing:
  * two genuinely independent duels with identical participants and
  * outcome are BOTH evidence and must both count, while a REPLAYED
  * event (same cmp_id) must collapse — exactly the row-keyed
  * distinct-merge idempotence the EpochStore crash matrix requires.
  * Pair counts and win totals derive from the event set inside
  * [[Preference.btRatings]], so nothing in state can drift from the
  * events across restarts (the PerceptronStream state-is-the-evidence
  * discipline).
  *
  * EMISSION IS VIEW-FORCED — the PageRank/Perceptron end of the
  * taxonomy, for the same structural reason: the MM update couples every
  * item through the shared denominators (one new comparison changes
  * w_i, which changes every t_ij it appears in, which moves every other
  * rating in the next round) — no per-batch rating rows could stand once
  * the next batch lands. `ratings()` runs the batch twin's OWN
  * [[Preference.btRatings]] (fixed integer MM rounds) over current
  * state — stream ≡ batch by shared code, not a parallel
  * reimplementation.
  *
  * RESTART SAFETY — the [[DeltaEpochStore]] contract (the event log
  * grows with the stream): per-epoch deltas computed from the batch
  * ALONE (a replayed batch re-derives identical rows; the distinct
  * merge collapses them), durable state advances save-first
  * (compute → persist → swap, the FuzzyStream ordering).
  *
  * 100 TB shape: the fold is one row-keyed distinct per batch; each
  * served view is x136's audited plan — ONE corpus-sized keyed
  * reduction (log → pair counts / win totals, map-side combined), then
  * the items²-bounded MM fixpoint on the driver under the
  * codebook-contract bound.
  */
object BtRatingStream {

  final case class Comparison(cmp_id: Long, item_a: Long, item_b: Long, winner: Long)

  private val cmpSchema = StructType(Seq(
    StructField("cmp_id", LongType),
    StructField("item_a", LongType),
    StructField("item_b", LongType),
    StructField("winner", LongType)))

  final class Maintainer(
      spark: SparkSession,
      val stateDir: Option[String] = None,
      compactEvery: Int = 8
  ) {

    private val store: Option[DeltaEpochStore] =
      stateDir.map(new DeltaEpochStore(spark, _, Seq("comparisons" -> cmpSchema), compactEvery))

    @volatile private var comparisons: DataFrame = store
      .flatMap(_.load())
      // raw compact+delta union → the same distinct merge the fold uses
      .map(m => m("comparisons").distinct().localCheckpoint(true))
      .getOrElse(EpochStore
        .emptyFrames(spark, Seq("comparisons" -> cmpSchema))
        .apply("comparisons"))

    /** True iff construction reloaded a persisted epoch (restart path). */
    def resumed: Boolean = store.exists(_.latestCommitted >= 0)

    /** The live distinct comparison-event set folded so far. */
    def state: DataFrame = comparisons

    /** Current ratings over everything folded so far — the batch twin's
      * output through the batch twin's own fitter (view-forced emission;
      * see the scaladoc taxonomy note).
      */
    def ratings(rounds: Int = 4): DataFrame =
      Preference.btRatings(
        comparisons.select(col("item_a"), col("item_b"), col("winner")),
        rounds)

    private[graft] def update(batch: DataFrame, epochId: Long = -1L): Unit = {
      // delta from the batch ALONE: replay after a failed save re-derives
      // the identical rows, and the distinct merge collapses them
      val delta = batch
        .select(
          col("cmp_id").cast(LongType),
          col("item_a").cast(LongType),
          col("item_b").cast(LongType),
          col("winner").cast(LongType))
        .distinct()
        .localCheckpoint(true)
      val newComparisons = comparisons.unionByName(delta).distinct().localCheckpoint(true)
      // save BEFORE the in-memory swap (the FuzzyStream ordering): a
      // failed save leaves pre-batch state, and the replayed epoch
      // recommits the same delta
      store.foreach(_.save(epochId, Map("comparisons" -> delta), Map("comparisons" -> newComparisons)))
      comparisons = newComparisons
    }
  }

  /** Start the maintainer over a streaming Dataset[Comparison]; call
    * `maintainer.ratings()` between batches for the live board.
    */
  def start(
      stream: Dataset[Comparison],
      maintainer: Maintainer,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      allowVolatileState: Boolean = false
  ): StreamingQuery = {
    require(
      checkpoint.isEmpty || maintainer.stateDir.nonEmpty || allowVolatileState,
      "checkpointLocation set but the Maintainer has no stateDir: a restart " +
        "would skip committed batches against an empty event set and rate " +
        "from a silently partial log. Pass a stateDir (persisted state) or " +
        "allowVolatileState = true if the checkpoint is known fresh.")
    val writer = stream.toDF.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        maintainer.update(batch.toDF(), epochId)
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }
}
