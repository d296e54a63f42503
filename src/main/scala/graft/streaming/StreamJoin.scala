package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join (SURVEY.md §2.5 upgrade path): enrich
  * one event stream with matching events of another — e.g. fills against
  * quotes, or snapshot ticks against the spot stream the reference polls
  * separately (main.py fetches options and spot in the same cron tick; a
  * streaming deployment receives them as two independent streams and must
  * join them on event time).
  *
  * Why the time-bound predicate is mandatory: without it, a stream-stream
  * join would have to buffer EVERY past row of both sides forever (any
  * future row might still match). The watermark + join-window bound makes
  * state finite and evictable:
  *   - each side declares a watermark (bounding how late its rows can be);
  *   - the join condition bounds right.ts to [left.ts − before, left.ts]
  *     so Spark can evict a buffered row once the other side's watermark
  *     passes its window — state is O(rows within the join window), not
  *     O(stream length);
  *   - the key equality makes it a hash join per micro-batch, shuffled by
  *     key on both sides: the same partitioning a batch join would pick.
  *
  * Works identically on batch DataFrames (watermarks are no-ops), which is
  * how StreamJoinSpec pins the matching semantics, and the streaming path
  * is driven through MemoryStream in the same spec.
  */
object StreamJoin {

  /** Inner-join `left` events to `right` events on `key`, keeping pairs
    * where the right event happened within `beforeMs` milliseconds at or
    * before the left event (microsecond timestamp columns).
    *
    * @param left      stream with `key` and `leftTs` (timestamp-typed)
    * @param right     stream with `key` and `rightTs` (timestamp-typed)
    * @param key       equality key column name on both sides
    * @param leftTs    left event-time column (timestamp)
    * @param rightTs   right event-time column (timestamp)
    * @param delay     watermark delay for both sides, e.g. "10 seconds"
    * @param before    max age of the right event relative to the left,
    *                  e.g. "30 seconds"
    */
  def enrich(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      delay: String,
      before: String
  ): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(
      r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $before") &&
        r(rightTs) <= l(leftTs),
      "inner"
    ).drop(r(key))
  }
}
