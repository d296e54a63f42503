package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoin

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("batch semantics: key equality + time window, inclusive bounds") {
    val fills = Seq((1L, ts(100), 10.0), (1L, ts(200), 11.0), (2L, ts(150), 20.0))
      .toDF("key", "fill_ts", "price")
    val quotes = Seq(
      (1L, ts(70), 9.8),   // 30 s before fill@100 → inclusive edge, matches
      (1L, ts(100), 9.9),  // simultaneous → matches
      (1L, ts(101), 10.1), // after fill@100, within window of fill@200? 200-30=170 → no
      (1L, ts(180), 10.2), // matches fill@200
      (2L, ts(149), 19.9), // matches fill@150
      (3L, ts(100), 30.0)  // wrong key
    ).toDF("key", "quote_ts", "quote")
    val out = StreamJoin
      .enrich(fills, quotes, "key", "fill_ts", "quote_ts", "10 seconds", "30 seconds")
      .select($"key", $"fill_ts", $"quote_ts", $"quote")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getTimestamp(2).getTime / 1000, r.getDouble(3)))
      .toSet
    assert(out === Set(
      (1L, 100L, 70L, 9.8),
      (1L, 100L, 100L, 9.9),
      (1L, 200L, 180L, 10.2),
      (2L, 150L, 149L, 19.9)
    ))
  }

  test("streaming: matches emit across micro-batches; state is watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val fills = MemoryStream[(Long, Timestamp, Double)]
    val quotes = MemoryStream[(Long, Timestamp, Double)]
    val query = StreamJoin
      .enrich(
        fills.toDF().toDF("key", "fill_ts", "price"),
        quotes.toDF().toDF("key", "quote_ts", "quote"),
        "key", "fill_ts", "quote_ts",
        delay = "5 seconds", before = "30 seconds"
      )
      .writeStream
      .format("memory")
      .queryName("sj_out")
      .outputMode(OutputMode.Append())
      .start()

    def emitted: Set[(Long, Long)] =
      spark.table("sj_out")
        .select($"fill_ts", $"quote_ts").collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getTimestamp(1).getTime / 1000))
        .toSet

    try {
      // quote arrives FIRST, fill in a LATER micro-batch: the buffered
      // quote must still join (that buffering is what the state is for)
      quotes.addData((1L, ts(95), 9.9))
      query.processAllAvailable()
      fills.addData((1L, ts(100), 10.0))
      query.processAllAvailable()
      assert(emitted === Set((100L, 95L)))

      // both sides advance far past the old window; a late quote for the
      // old fill is beyond the watermark → dropped, no new pair
      fills.addData((1L, ts(500), 12.0))
      quotes.addData((1L, ts(500), 11.9))
      query.processAllAvailable()
      quotes.addData((1L, ts(80), 9.7)) // would have matched fill@100
      query.processAllAvailable()
      assert(emitted === Set((100L, 95L), (500L, 500L)))
    } finally query.stop()
  }
}
