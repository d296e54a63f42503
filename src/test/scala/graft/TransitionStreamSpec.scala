package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Sessionize
import graft.streaming.TransitionStream
import graft.streaming.TransitionStream.{Ev, Transition}

/** The streamed transition rows over any prefix, aggregated, must equal
  * the batch [[Sessionize.transitionCounts]] matrix of that prefix — the
  * seventh batch/stream twin.
  */
class TransitionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def batchMatrix(evs: Seq[Ev]): Set[(String, String, Long, Long)] =
    Sessionize
      .transitionCounts(
        evs.toDF(), col("user_id"), col("ts_us"), col("event_id"), col("state"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def streamMatrix(rows: Seq[Transition]): Set[(String, String, Long, Long)] = {
    val counts = rows.groupBy(t => (t.prev_state, t.next_state)).view.mapValues(_.size.toLong)
    val totals = counts.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    counts.toSeq.map { case ((p, n), c) => (p, n, c, c * 1000000L / totals(p)) }.toSet
  }

  test("prefix equality with the batch matrix, transitions spanning micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = TransitionStream
      .transitions(input.toDS())
      .writeStream
      .format("memory")
      .queryName("trans_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val b1 = Seq(Ev(1L, "a", 10L, 1L), Ev(1L, "b", 20L, 2L), Ev(2L, "x", 5L, 3L))
      val b2 = Seq(Ev(1L, "b", 30L, 4L), Ev(2L, "y", 15L, 5L), Ev(3L, "solo", 7L, 6L))
      val b3 = Seq(Ev(1L, "a", 40L, 7L), Ev(2L, "x", 25L, 8L))
      var seen = Seq.empty[Ev]
      for (b <- Seq(b1, b2, b3)) {
        input.addData(b: _*); query.processAllAvailable()
        seen ++= b
        val got = spark.table("trans_out").as[Transition].collect().toSeq
        assert(streamMatrix(got) === batchMatrix(seen), s"after ${seen.size} events")
      }
      // the a→b at ts 20 and b→b spanning batches 1→2 both present
      val rows = spark.table("trans_out").as[Transition].collect().toSet
      assert(rows.contains(Transition(1L, "a", "b", 20L)))
      assert(rows.contains(Transition(1L, "b", "b", 30L)))
      // user 3's lone event produced nothing
      assert(!rows.exists(_.user_id == 3L))
    } finally query.stop()
  }

  test("unsorted within-batch arrival folds in (ts, event_id) order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = TransitionStream
      .transitions(input.toDS())
      .writeStream
      .format("memory")
      .queryName("trans_unsorted")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val evs = Seq(
        Ev(9L, "c", 30L, 3L), Ev(9L, "a", 10L, 1L), Ev(9L, "b", 20L, 2L),
        Ev(9L, "b", 20L, 4L)) // same-ts tie: event_id orders b(2) before b(4)
      input.addData(evs: _*); query.processAllAvailable()
      val got = spark.table("trans_unsorted").as[Transition].collect().toSeq
        .sortBy(t => (t.ts_us, t.prev_state))
      assert(got.map(t => (t.prev_state, t.next_state)) ===
        Seq(("a", "b"), ("b", "b"), ("b", "c")))
      assert(streamMatrix(got) === batchMatrix(evs))
    } finally query.stop()
  }
}
