package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Robust
import graft.streaming.QuantileStream
import graft.streaming.QuantileStream.{El, Quant}

class QuantileStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Latest emission per key (n_total is monotone over a key's lifetime,
    * so max-by is order-free).
    */
  private def latest(table: String): Map[String, Quant] =
    spark.table(table).as[Quant].collect()
      .groupBy(_.key)
      .map { case (k, qs) => k -> qs.maxBy(_.n_total) }

  test("stream quantile at binShift=0 equals the batch operator's exact q_value after every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq("a" -> 5L, "a" -> 1L, "a" -> 9L, "b" -> 100L, "b" -> -20L)
    val b2 = Seq("a" -> 7L, "a" -> 3L, "b" -> 0L, "b" -> -20L) // re-observation counts
    val input = MemoryStream[El]
    val query = QuantileStream
      .quantiles(input.toDS(), pNum = 1L, pDenom = 2L, binShift = 0)
      .writeStream.format("memory").queryName("q_stream0")
      .outputMode(OutputMode.Update())
      .start()
    try {
      def expectBatch(prefix: Seq[(String, Long)]): Map[String, (Long, Long, Long)] =
        Robust
          .binnedQuantileDisc(prefix.toDF("k", "v"), col("k"), col("v"), 1L, 2L, 0)
          .collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
          .toMap
      input.addData(b1.map { case (k, v) => El(k, v) }: _*)
      query.processAllAvailable()
      val mid = latest("q_stream0")
      val expMid = expectBatch(b1)
      for (k <- Seq("a", "b"))
        assert((mid(k).n_total, mid(k).target_rank, mid(k).q_bin_lo) === expMid(k))

      input.addData(b2.map { case (k, v) => El(k, v) }: _*)
      query.processAllAvailable()
      val fin = latest("q_stream0")
      val expFin = expectBatch(b1 ++ b2)
      for (k <- Seq("a", "b"))
        assert((fin(k).n_total, fin(k).target_rank, fin(k).q_bin_lo) === expFin(k))
      assert(fin("a").n_total === 5L) // both batches merged, counts not set-deduped
    } finally query.stop()
  }

  test("binShift>0 emits the batch target bin's lower bound; p sweep against a reference fold") {
    implicit val sqlCtx = spark.sqlContext
    val vals = Seq(3L, 18L, 35L, 36L, 37L, 64L, 999L, -5L, -33L)
    for ((pn, pd) <- Seq((0L, 1L), (1L, 2L), (95L, 100L), (1L, 1L))) {
      val input = MemoryStream[El]
      val name = s"q_stream_${pn}_$pd"
      val query = QuantileStream
        .quantiles(input.toDS(), pn, pd, binShift = 4)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update())
        .start()
      try {
        input.addData(vals.map(El("k", _)): _*)
        query.processAllAvailable()
        val got = latest(name)("k")
        // reference: walk the sorted (bin, count) histogram
        val hist = vals.groupBy(_ >> 4).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        val n = vals.size.toLong
        val target = pn * (n - 1) / pd
        val bin = {
          var cum = 0L
          hist.find { case (_, c) => { cum += c; cum > target } }.get._1
        }
        assert((got.n_total, got.target_rank, got.q_bin_lo) === ((n, target, bin << 4)))
      } finally query.stop()
    }
  }
}
