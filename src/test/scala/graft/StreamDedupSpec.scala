package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamDedup

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("suppresses duplicates within the watermark, re-admits after eviction") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = StreamDedup
      .byDigestWithinWatermark(input.toDF().toDF("id", "ts", "text"), "ts", "10 seconds")
      .writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .start()

    def emittedIds: Set[Long] =
      spark.table("dedup_out").select("id").as[Long].collect().toSet

    try {
      // the digest helper is internal: output schema equals input schema
      assert(spark.table("dedup_out").columns.toSeq === Seq("id", "ts", "text"))
      // batch 1: same text twice → exactly one survives (which of the two
      // is partition-order dependent within a micro-batch)
      input.addData((1L, ts(0), "alpha"), (2L, ts(1), "alpha"))
      query.processAllAvailable()
      val survivor = emittedIds
      assert(survivor.size === 1 && survivor.subsetOf(Set(1L, 2L)))

      // batch 2: dup within watermark suppressed, new content emitted
      input.addData((3L, ts(2), "alpha"), (4L, ts(3), "beta"))
      query.processAllAvailable()
      assert(emittedIds === survivor + 4L)

      // batch 3: event far ahead advances the watermark past "alpha"'s state
      input.addData((5L, ts(100), "gamma"))
      query.processAllAvailable()

      // batch 4: "alpha" state was evicted → re-admitted (documented
      // at-least-once-beyond-watermark semantics)
      input.addData((6L, ts(101), "alpha"))
      query.processAllAvailable()
      assert(emittedIds === survivor ++ Set(4L, 5L, 6L))
    } finally query.stop()
  }
}
