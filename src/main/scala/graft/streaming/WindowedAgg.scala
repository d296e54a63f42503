package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermark-bounded state
  * (SURVEY.md §2.5: the Structured-Streaming upgrade path the reference's
  * cron loop cannot express).
  *
  * The reference observes open interest only at whatever instant the cron
  * fires; a streaming deployment instead folds every snapshot into
  * tumbling event-time windows, giving per-window OI/price rollups that
  * are correct under late and out-of-order arrival:
  *   - the watermark bounds BOTH state (windows older than
  *     max(event_time) − delay are finalized and evicted — state size is
  *     O(active windows × keys), independent of stream length) and
  *     lateness (rows older than the watermark are dropped, not silently
  *     double-counted);
  *   - aggregates are partial-aggregated map-side before the (window, key)
  *     shuffle, the same one-shuffle shape as the batch groupBy.
  *
  * Works identically on a batch DataFrame (watermark becomes a no-op),
  * which is how the spec pins the aggregation semantics and the driver can
  * smoke it without a streaming source.
  */
object WindowedAgg {

  /** Per-(tumbling window × key) open-interest rollup.
    *
    * @param snaps     snapshots with an event-time column, `OI` (long) and
    *                  `Close` (double) — the parsed shape, post
    *                  [[graft.operators.OptionsPipeline.parseSnapshot]]
    * @param eventTime event-time timestamp column name
    * @param windowDur tumbling window duration, e.g. "1 hour"
    * @param delay     watermark delay, e.g. "10 minutes"
    * @param keys      grouping keys beside the window (default: option side)
    */
  def oiByWindow(
      snaps: DataFrame,
      eventTime: String = "event_time",
      windowDur: String = "1 hour",
      delay: String = "10 minutes",
      keys: Seq[Column] = Seq(col("Option_Type"))
  ): DataFrame =
    snaps
      .withWatermark(eventTime, delay)
      .groupBy((window(col(eventTime), windowDur) +: keys): _*)
      .agg(
        sum(col("OI")).as("total_oi"),
        avg(col("Close")).as("avg_close"),
        count(lit(1)).as("n_snapshots")
      )
      .select(
        (Seq(col("window.start").as("window_start"), col("window.end").as("window_end")) ++
          keys ++ Seq(col("total_oi"), col("avg_close"), col("n_snapshots"))): _*
      )
}
