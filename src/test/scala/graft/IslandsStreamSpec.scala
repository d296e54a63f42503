package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Scd2
import graft.streaming.IslandsStream
import graft.streaming.IslandsStream.{Ev, Interval}

/** Streaming islands must reproduce the batch SCD2 operator: every CLOSED
  * interval emitted by the stream equals the batch compressHistory row set
  * with non-null valid_to over the same event prefix, including runs that
  * span micro-batch boundaries.
  */
class IslandsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def batchClosed(evs: Seq[Ev]): Set[Interval] =
    Scd2
      .compressHistory(
        evs.toDF(),
        keyCol = col("user_id"),
        stateCol = col("state"),
        orderCols = Seq(col("ts_us"), col("event_id")),
        validityCol = col("ts_us")
      )
      .where(col("valid_to").isNotNull)
      .select(
        col("graft_key").as("user_id"),
        col("state"),
        col("valid_from"),
        col("valid_to"),
        col("n_events")
      )
      .as[Interval]
      .collect()
      .toSet

  test("closed intervals match the batch operator, including a run spanning batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = IslandsStream
      .intervals(input.toDS())
      .writeStream
      .format("memory")
      .queryName("islands_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val b1 = Seq(Ev(1L, "A", 10L, 1L), Ev(1L, "A", 20L, 2L), Ev(2L, "x", 5L, 3L))
      val b2 = Seq(Ev(1L, "A", 30L, 4L), Ev(1L, "B", 40L, 5L), Ev(2L, "y", 15L, 6L))
      val b3 = Seq(Ev(1L, "A", 50L, 7L)) // re-entry: third island for user 1
      input.addData(b1: _*); query.processAllAvailable()
      input.addData(b2: _*); query.processAllAvailable()
      input.addData(b3: _*); query.processAllAvailable()
      val got = spark.table("islands_out").as[Interval].collect().toSet
      assert(got === batchClosed(b1 ++ b2 ++ b3))
      // the A-run closed at 40 spans batches 1-2 with all 3 events counted
      assert(got.contains(Interval(1L, "A", 10L, 40L, 3L)))
    } finally query.stop()
  }

  test("within-batch multi-transition emits every interior interval") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = IslandsStream
      .intervals(input.toDS())
      .writeStream
      .format("memory")
      .queryName("islands_multi")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // arrives unsorted — the fold must order by (ts, event_id) first
      val evs = Seq(
        Ev(9L, "c", 30L, 3L), Ev(9L, "a", 10L, 1L), Ev(9L, "b", 20L, 2L), Ev(9L, "b", 25L, 4L))
      input.addData(evs: _*); query.processAllAvailable()
      val got = spark.table("islands_multi").as[Interval].collect().toSet
      assert(got === Set(
        Interval(9L, "a", 10L, 20L, 1L),
        Interval(9L, "b", 20L, 30L, 2L)
      ))
      assert(got === batchClosed(evs))
    } finally query.stop()
  }
}
