package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming counterpart of
  * `operators/Dedup.exact`.
  *
  * State contract (the part that matters at continuous 100 TB-scale
  * ingest): `dropDuplicatesWithinWatermark` keeps one state entry per key
  * and EVICTS entries once the watermark passes their event time, so state
  * is bounded by keys-per-watermark-window, not by all history. The cost
  * of that bound is the documented re-admission semantics: a duplicate
  * arriving after its key's state was evicted is emitted again —
  * exactly-once dedup within the watermark, at-least-once beyond it.
  * Unbounded-history dedup (`dropDuplicates` on a stream) is the
  * state-leak this operator exists to avoid.
  */
object StreamDedup {

  /** Drop rows whose key columns were already seen within the watermark.
    * `tsCol` must be an event-time timestamp column; `delay` e.g.
    * "10 minutes".
    */
  def withinWatermark(events: DataFrame, tsCol: String, delay: String, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Content-digest dedup of a text stream: key = md5 of the text column
    * (16 bytes of state per doc instead of the document body — the same
    * digest-not-text rule the batch dedup follows). The digest is an
    * internal helper column, dropped again before returning — output
    * schema equals input schema.
    */
  def byDigestWithinWatermark(
      events: DataFrame,
      tsCol: String,
      delay: String,
      textCol: String = "text"
  ): DataFrame = {
    require(
      !events.columns.contains("__text_md5"),
      "input already has the internal dedup column __text_md5"
    )
    withinWatermark(
      events.withColumn("__text_md5", md5(col(textCol))),
      tsCol,
      delay,
      Seq("__text_md5")
    ).drop("__text_md5")
  }
}
