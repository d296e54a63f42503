package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Sessionize
import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{Ev, FunnelRow}

/** The streamed funnel row after any prefix must equal the batch
  * [[Sessionize.funnelStages]] row over that prefix — the eighth
  * batch/stream twin.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("a", "b", "c")

  private def batchRows(evs: Seq[Ev]): Map[Long, (Long, Seq[Long])] =
    Sessionize
      .funnelStages(
        evs.toDF(), col("user_id"), col("ts_us"), col("event_id"), col("state"), steps)
      .collect()
      .map { r =>
        val pos = (2 to 4).map(i => r.getLong(i)).filter(_ >= 0)
        r.getLong(0) -> ((r.getLong(1), pos))
      }
      .toMap

  /** Latest emitted row per key (Update-mode memory sink appends every
    * batch's updates; the last one is the current funnel).
    */
  private def latest(table: String): Map[Long, (Long, Seq[Long])] = {
    val rows = spark.table(table).as[FunnelRow].collect()
    rows.zipWithIndex
      .groupBy(_._1.user_id)
      .map { case (u, rs) =>
        val r = rs.maxBy(_._2)._1
        u -> ((r.stage, r.positions.toSeq))
      }
  }

  test("prefix equality with the batch funnel, stage advancing across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = FunnelStream
      .funnel(input.toDS(), steps)
      .writeStream
      .format("memory")
      .queryName("funnel_out")
      .outputMode(OutputMode.Update())
      .start()
    try {
      val b1 = Seq(
        Ev(1L, "b", 10L, 1L), Ev(1L, "a", 20L, 2L), // decoy b before a
        Ev(2L, "a", 10L, 3L),
        Ev(3L, "c", 10L, 4L)) // c without a: stage 0
      val b2 = Seq(
        Ev(1L, "b", 30L, 5L), // completes step 2 across the batch boundary
        Ev(2L, "c", 20L, 6L)) // c before b: stays stage 1
      val b3 = Seq(
        Ev(1L, "c", 40L, 7L), // stage 3
        Ev(2L, "b", 30L, 8L), Ev(2L, "c", 40L, 9L)) // now b then c: stage 3
      var seen = Seq.empty[Ev]
      for (b <- Seq(b1, b2, b3)) {
        input.addData(b: _*); query.processAllAvailable()
        seen ++= b
        assert(latest("funnel_out") === batchRows(seen), s"after ${seen.size} events")
      }
      val fin = latest("funnel_out")
      assert(fin(1L) === ((3L, Seq(2L, 3L, 4L)))) // a@2 (decoy b is pos1), b@3, c@4
      assert(fin(3L)._1 === 0L)
    } finally query.stop()
  }

  test("unsorted within-batch arrival folds in (ts, event_id) order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = FunnelStream
      .funnel(input.toDS(), steps)
      .writeStream
      .format("memory")
      .queryName("funnel_unsorted")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // arrives reversed; (ts, event_id) order is a@10, b@20, c@30
      input.addData(Ev(9L, "c", 30L, 3L), Ev(9L, "b", 20L, 2L), Ev(9L, "a", 10L, 1L))
      query.processAllAvailable()
      assert(latest("funnel_unsorted")(9L) === ((3L, Seq(1L, 2L, 3L))))
    } finally query.stop()
  }
}
