package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.DistinctSketch
import graft.streaming.DistinctStream
import graft.streaming.DistinctStream.{El, Estimate}

class DistinctStreamSpec extends SparkSpec {
  import spark.implicits._

  test("hash40Scala is bit-identical to the hash40 Column form") {
    val samples = Seq("", "a", "user_42", "Ünïcôdé ⚡", "0", "-17", List.fill(100)("x").mkString)
    val colSide = samples.toDF("s")
      .select(DistinctSketch.hash40(col("s")))
      .collect().map(_.getLong(0))
    assert(colSide.toSeq === samples.map(DistinctSketch.hash40Scala))
  }

  test("streaming estimates converge to the batch sketch over the same data") {
    implicit val sqlCtx = spark.sqlContext
    val k = 16
    // two keys: "small" stays under k (exact), "big" crosses it (estimator)
    val batch1 = (0 until 10).map(i => El("small", s"s$i")) ++
      (0 until 30).map(i => El("big", s"b$i"))
    val batch2 = (5 until 12).map(i => El("small", s"s$i")) ++ // 2 new + 5 dups
      (20 until 80).map(i => El("big", s"b$i"))

    val input = MemoryStream[El]
    val query = DistinctStream.estimates(input.toDS(), k)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      val mid = spark.table("kmv_stream").as[Estimate].collect()
        .map(e => e.key -> e).toMap
      assert(mid("small").n_tracked === 10L && mid("small").est_distinct === 10L)
      assert(mid("big").n_tracked === 16L)

      input.addData(batch2: _*)
      query.processAllAvailable()
      // latest emission per key must equal the BATCH operator over all data
      val all = (batch1 ++ batch2).toDF("g", "v")
      val expect = DistinctSketch.kmvDistinct(all, Seq("g"), col("v"), k)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3)))
        .toMap
      // latest = max by (n_tracked, est): both are monotone nondecreasing
      // over a key's lifetime (mins only shrink), so this is order-free
      val fin = spark.table("kmv_stream").as[Estimate].collect()
        .groupBy(_.key)
        .map { case (key, es) => key -> es.maxBy(e => (e.n_tracked, e.est_distinct)) }
      assert((fin("small").n_tracked, fin("small").est_distinct) === expect("small"))
      assert((fin("big").n_tracked, fin("big").est_distinct) === expect("big"))
      assert(fin("small").est_distinct === 12L) // exact: 12 distinct < k
    } finally query.stop()
  }

  test("state stays bounded at k entries however many distincts stream in") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[El]
    val query = DistinctStream.estimates(input.toDS(), k = 8)
      .writeStream.format("memory").queryName("kmv_bounded")
      .outputMode(OutputMode.Update())
      .start()
    try {
      (0 until 5).foreach { b =>
        input.addData((0 until 200).map(i => El("g", s"v_${b}_$i")): _*)
        query.processAllAvailable()
      }
      val rows = spark.table("kmv_bounded").as[Estimate].collect()
      assert(rows.forall(_.n_tracked <= 8L))
      // 1000 true distincts through a k=8 sketch: estimate is coarse
      // (±1/sqrt(8) ≈ 35%) but must be in the right decade
      val last = rows.maxBy(_.est_distinct)
      assert(last.est_distinct > 300L && last.est_distinct < 3000L,
        s"est=${last.est_distinct} for true 1000")
    } finally query.stop()
  }
}
