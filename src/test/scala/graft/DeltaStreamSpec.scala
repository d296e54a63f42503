package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.DeltaStream
import graft.streaming.DeltaStream.{Diffed, Snap}

/** Streaming formulation: two micro-batches through flatMapGroupsWithState
  * must reproduce the batch Delta semantics (first sight → zeros; then
  * Open = prev Close, OI_Change = OI − prev OI), including state carried
  * across batches and keep-last within a batch.
  */
class DeltaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("two micro-batches reproduce snapshot-diff semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Snap]
    val query = DeltaStream
      .withDelta(input.toDS())
      .writeStream
      .format("memory")
      .queryName("delta_out")
      .outputMode(OutputMode.Append())
      .start()

    try {
      input.addData(Snap("A", 10.0, 100L, 1L), Snap("B", 20.0, 200L, 2L))
      query.processAllAvailable()
      val b1 = spark.table("delta_out").as[Diffed].collect().sortBy(_.symbol)
      assert(b1.toSeq === Seq(
        Diffed("A", 10.0, 100L, 0.0, 0L),
        Diffed("B", 20.0, 200L, 0.0, 0L)
      ))

      // batch 2: A updates (hit), C new (miss), A twice (within-batch chain)
      input.addData(Snap("A", 11.0, 110L, 3L), Snap("A", 12.0, 130L, 4L), Snap("C", 5.0, 50L, 5L))
      query.processAllAvailable()
      val all = spark.table("delta_out").as[Diffed].collect()
      val a2 = all.filter(d => d.symbol == "A" && d.close == 11.0).head
      assert(a2.open === 10.0 && a2.oiChange === 10L)
      val a3 = all.filter(d => d.symbol == "A" && d.close == 12.0).head
      assert(a3.open === 11.0 && a3.oiChange === 20L)
      val c = all.filter(_.symbol == "C").head
      assert(c.open === 0.0 && c.oiChange === 0L)
    } finally query.stop()
  }
}
