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

  test("property: streaming ≡ batch Delta over random two-batch sequences") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.operators.Delta

    val snapGen: Gen[List[(String, Double, Long)]] = Gen.listOfN(
      10,
      for {
        s <- Gen.oneOf((1 to 6).map(i => s"S$i"))
        close <- Gen.choose(0.0, 100.0).map(v => math.rint(v * 100) / 100)
        oi <- Gen.choose(0L, 1000L)
      } yield (s, close, oi)
    )

    (1 to 5).foreach { trial =>
      val seed = Seed(trial.toLong * 104729)
      val b1raw = snapGen.pureApply(Gen.Parameters.default, seed)
      val b2raw = snapGen.pureApply(Gen.Parameters.default, seed.next)
      // keep-last dedup per batch, as the batch pipeline does pre-join —
      // with deduped inputs the streaming path must emit identical rows
      def dedup(rows: List[(String, Double, Long)], seqBase: Long) =
        rows.zipWithIndex
          .groupBy(_._1._1)
          .map { case (_, rs) => val ((s, c, o), i) = rs.maxBy(_._2); Snap(s, c, o, seqBase + i) }
          .toSeq
      val b1 = dedup(b1raw, 0L)
      val b2 = dedup(b2raw, 100L)

      // streaming path: two micro-batches
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Snap]
      val query = DeltaStream
        .withDelta(input.toDS())
        .writeStream
        .format("memory")
        .queryName(s"delta_prop_$trial")
        .outputMode(OutputMode.Append())
        .start()
      val streamed =
        try {
          input.addData(b1: _*)
          query.processAllAvailable()
          val afterB1 = spark.table(s"delta_prop_$trial").as[Diffed].collect().toSet
          input.addData(b2: _*)
          query.processAllAvailable()
          val all = spark.table(s"delta_prop_$trial").as[Diffed].collect().toSet
          (afterB1, all -- afterB1)
        } finally query.stop()

      // batch path: batch1 vs empty state, batch2 vs batch1's output
      def df(snaps: Seq[Snap]) =
        snaps.map(s => (s.symbol, s.close, s.oi, s.batchSeq)).toDF("SYMBOL", "Close", "OI", "state_seq")
      val empty = df(Nil)
      val out1 = Delta.applyDelta(df(b1), Delta.prepareState(empty, "state_seq"))
      val out2 = Delta.applyDelta(df(b2), Delta.prepareState(df(b1), "state_seq"))
      def toDiffed(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
        Diffed(
          r.getString(r.fieldIndex("SYMBOL")),
          r.getDouble(r.fieldIndex("Close")),
          r.getLong(r.fieldIndex("OI")),
          r.getDouble(r.fieldIndex("Open")),
          r.getLong(r.fieldIndex("OI_Change"))
        )
      }.toSet
      assert(streamed._1 === toDiffed(out1.collect()), s"trial $trial batch 1")
      assert(streamed._2 === toDiffed(out2.collect()), s"trial $trial batch 2")
    }
  }
}
