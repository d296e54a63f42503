package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2-style state-change compression (gaps-and-islands): collapse an
  * ordered per-key event history into validity intervals, one row per
  * maximal run of an unchanged state value.
  *
  * This is the "history table" the reference pipeline maintains implicitly
  * — its state sheet keeps only the latest snapshot per contract
  * (reference main.py:282-311 keep-last dedup), so the time dimension is
  * lost; SCD2 compression is the standard warehouse answer when the
  * history itself is the product (validity windows instead of last-writer
  * -wins). It is also a training-data-pipeline primitive: compressing
  * per-source crawl states ("which license/robots state was this domain
  * in, when?") before joining documents against the interval that covers
  * their fetch time (see [[AsofJoin]] / [[RangeJoin]] for the probe side).
  *
  * Scale design (100 TB posture):
  *   - ONE hash exchange on the partition key. The run-boundary lag, the
  *     running-sum island id, the per-island aggregation, and the
  *     valid_to lead ALL reuse the same `HashPartitioning(key)`: the two
  *     stacked windows are partitioned by the key, and the island
  *     `groupBy(key, island)` is satisfied by the key-only partitioning
  *     (Catalyst's HashShuffleSpec: a partitioning on a SUBSET of the
  *     grouping keys satisfies the clustered distribution — no second
  *     exchange). Plan-pinned in Scd2Spec.
  *   - Per-partition state is one key's event list at a time (sort-based
  *     window), never the corpus: skew bounded by the hottest single key,
  *     the same bound Sessionize carries.
  *   - No driver-side state; nothing collected.
  */
object Scd2 {

  /** Compress `events` into state intervals per `keyCol`.
    *
    * @param stateCol  the tracked state column (a run = consecutive rows,
    *                  in `orderCols` order, with equal state; null-safe —
    *                  a null state is its own run value)
    * @param orderCols total per-key order (ties must be broken — pass the
    *                  event id as the last order column)
    * @param validityCol column whose min/lead defines the interval bounds
    *                  (typically the first of `orderCols`, e.g. epoch
    *                  micros)
    * @return one row per island: key, state, valid_from (first
    *         `validityCol` of the run), valid_to (the NEXT run's
    *         valid_from; null for the key's current run), n_events
    */
  def compressHistory(
      events: DataFrame,
      keyCol: Column,
      stateCol: Column,
      orderCols: Seq[Column],
      validityCol: Column
  ): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    // run boundary: state differs from the previous row's (null-safe:
    // <=> handles both the partition's first row and null states)
    val boundary = when(stateCol <=> lag(stateCol, 1).over(w), lit(0L)).otherwise(lit(1L))
    val islands = events
      .withColumn("graft_island", sum(boundary).over(w))
    islands
      .groupBy(keyCol.as("graft_key"), col("graft_island"))
      .agg(
        // state is constant within an island by construction
        first(stateCol).as("state"),
        min(validityCol).as("valid_from"),
        count(lit(1)).as("n_events")
      )
      .withColumn(
        "valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(col("graft_key")).orderBy(col("graft_island"))
        )
      )
      .select(
        col("graft_key"),
        col("state"),
        col("valid_from"),
        col("valid_to"),
        col("n_events")
      )
  }
}
