package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.HeavyHittersStream
import graft.streaming.HeavyHittersStream.{Candidate, Tok}

class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Latest emission per key = the rows carrying its max n_processed
    * (n is strictly increasing per key across batches that touch it).
    */
  private def latest(rows: Array[Candidate]): Map[String, Map[String, Long]] =
    rows.groupBy(_.key).map { case (k, rs) =>
      val n = rs.map(_.n_processed).max
      k -> rs.filter(_.n_processed == n).map(c => c.token -> c.count_lb).toMap
    }

  test("no-eviction regime: stream counters equal exact counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    // 6 distinct tokens through a k=10 sketch: nothing ever evicts, so
    // the sketch IS an exact counter and the result is order-insensitive
    val batch1 = Seq.fill(5)(Tok("a", "x")) ++ Seq.fill(3)(Tok("a", "y")) ++
      Seq(Tok("b", "p"), Tok("b", "q"))
    val batch2 = Seq.fill(4)(Tok("a", "x")) ++ Seq(Tok("a", "z"), Tok("b", "p"))
    val input = MemoryStream[Tok]
    val query = HeavyHittersStream.candidates(input.toDS(), k = 10)
      .writeStream.format("memory").queryName("mg_exact")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      val fin = latest(spark.table("mg_exact").as[Candidate].collect())
      assert(fin("a") === Map("x" -> 9L, "y" -> 3L, "z" -> 1L))
      assert(fin("b") === Map("p" -> 2L, "q" -> 1L))
    } finally query.stop()
  }

  test("eviction regime: candidates stay <= k, counters never overcount, heavy token survives") {
    implicit val sqlCtx = spark.sqlContext
    // one key, 60 distinct tail tokens through a k=5 sketch, with "hot"
    // at 30/90 = 33% of the stream (> 1/k = 20%): hot MUST survive every
    // batch; every counter is a lower bound whatever the fold order
    val k = 5
    val batches = (0 until 3).map { b =>
      (0 until 10).map(_ => Tok("g", "hot")) ++
        (0 until 20).map(i => Tok("g", s"tail_${b}_$i"))
    }
    val trueCounts = batches.flatten.groupBy(_.token).view.mapValues(_.size.toLong).toMap
    val input = MemoryStream[Tok]
    val query = HeavyHittersStream.candidates(input.toDS(), k)
      .writeStream.format("memory").queryName("mg_evict")
      .outputMode(OutputMode.Update())
      .start()
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        query.processAllAvailable()
      }
      val rows = spark.table("mg_evict").as[Candidate].collect()
      // per-emission candidate sets stay sketch-bounded
      rows.groupBy(r => (r.key, r.n_processed)).foreach { case (_, rs) =>
        assert(rs.length <= k, s"emission with ${rs.length} candidates > k=$k")
      }
      val fin = latest(rows)("g")
      assert(fin.contains("hot"), s"33% token evicted from a k=5 sketch: $fin")
      fin.foreach { case (t, c) =>
        assert(c <= trueCounts(t), s"counter overcounts $t: $c > ${trueCounts(t)}")
      }
      assert(rows.map(_.n_processed).max === 90L)
    } finally query.stop()
  }

  test("single-batch fold matches a sequential MgBuffer over the same elements") {
    implicit val sqlCtx = spark.sqlContext
    // one micro-batch, one key: the stream fold IS one sequential
    // Misra-Gries pass, so it must equal the batch MgBuffer verbatim
    val toks = Seq("a", "a", "a", "b", "b", "c") // k=2: classic eviction case
    val ref = new graft.functions.MgBuffer(2)
    toks.foreach(ref.add)
    val want = {
      val it = ref.counts.entrySet().iterator()
      val b = Seq.newBuilder[(String, Long)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.longValue) }
      b.result().toMap
    }
    val input = MemoryStream[Tok]
    val query = HeavyHittersStream.candidates(input.toDS(), k = 2)
      .writeStream.format("memory").queryName("mg_seq")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(toks.map(Tok("g", _)): _*)
      query.processAllAvailable()
      val fin = latest(spark.table("mg_seq").as[Candidate].collect())("g")
      assert(fin === want) // {a -> 2, b -> 1}, c evicted on arrival
    } finally query.stop()
  }
}
