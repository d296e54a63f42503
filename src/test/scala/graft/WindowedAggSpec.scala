package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.WindowedAgg

class WindowedAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hhmm: String) = Timestamp.valueOf(s"2025-10-15 $hhmm:00")

  test("batch semantics: tumbling windows roll up OI per option side") {
    val df = Seq(
      (ts("10:05"), "Call", 10.0, 100L),
      (ts("10:55"), "Call", 12.0, 110L),
      (ts("10:30"), "Put", 5.0, 50L),
      (ts("11:10"), "Call", 13.0, 120L)
    ).toDF("event_time", "Option_Type", "Close", "OI")
    val out = WindowedAgg
      .oiByWindow(df)
      .orderBy("window_start", "Option_Type")
      .collect()
    assert(out.length === 3)
    val call10 = out(0)
    assert(call10.getString(2) === "Call")
    assert(call10.getLong(3) === 210L) // total_oi
    assert(math.abs(call10.getDouble(4) - 11.0) < 1e-9) // avg_close
    assert(call10.getLong(5) === 2L) // n_snapshots
  }

  test("streaming: watermark finalizes windows and drops late rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val query = WindowedAgg
      .oiByWindow(input.toDF().toDF("event_time", "Option_Type", "Close", "OI"))
      .writeStream
      .format("memory")
      .queryName("oi_windows")
      .outputMode(OutputMode.Append()) // append ⟹ only watermark-closed windows emit
      .start()
    try {
      input.addData((ts("10:05"), "Call", 10.0, 100L), (ts("10:20"), "Call", 12.0, 110L))
      query.processAllAvailable()
      // watermark still at 10:20 − 10m: nothing finalized yet
      assert(spark.table("oi_windows").count() === 0)

      // event time jumps to 12:00 → watermark 11:50 → the 10:00 window closes
      input.addData((ts("12:00"), "Put", 5.0, 50L))
      query.processAllAvailable()
      val closed = spark.table("oi_windows").collect()
      assert(closed.length === 1)
      assert(closed(0).getLong(3) === 210L)

      // a row for the already-closed 10:00 window is LATE (< watermark):
      // dropped by the watermark, not double-counted into a reopened window
      input.addData((ts("10:40"), "Call", 99.0, 999L))
      query.processAllAvailable()
      assert(spark.table("oi_windows").count() === 1)
    } finally query.stop()
  }
}
