package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Sampling
import graft.streaming.SampleStream
import graft.streaming.SampleStream.{El, Member}

class SampleStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Batch twin over the same (group, key, weight) rows — tieBreak = key,
    * the same total order the stream state uses.
    */
  private def batchSample(rows: Seq[El], k: Int): Map[String, Set[(String, Long)]] =
    Sampling
      .weightedSamplePerGroup(
        rows.toDF("g", "k", "w"),
        group = col("g"), key = col("k"), weight = col("w"),
        tieBreak = col("k"), k = k)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSet).toMap

  /** Feed batches through the stream; return each batch's emission rows
    * (the memory sink appends, so batch i's rows are the slice beyond the
    * previous cumulative count).
    */
  private def runStream(batches: Seq[Seq[El]], k: Int): Seq[Array[Member]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[El]
    val name = s"wsample_${math.abs(batches.hashCode)}_$k"
    val query = SampleStream.samples(input.toDS(), k)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .start()
    try {
      var prev = 0
      batches.map { b =>
        input.addData(b: _*)
        query.processAllAvailable()
        val all = spark.table(name).as[Member].collect()
        val emission = all.drop(prev)
        prev = all.length
        emission
      }
    } finally query.stop()
  }

  test("stream sample after each prefix equals the batch sample of that prefix") {
    val k = 5
    val b1 = (0 until 20).map(i => El("g", s"key_$i", (i % 4) + 1L))
    val b2 = (20 until 50).map(i => El("g", s"key_$i", (i % 7) + 1L)) ++
      (0 until 5).map(i => El("h", s"other_$i", 1L))
    val emissions = runStream(Seq(b1, b2), k)

    val afterB1 = emissions(0).filter(_.group == "g").map(m => (m.key, m.weight)).toSet
    assert(afterB1 === batchSample(b1, k)("g"), "prefix-1 sample drifted from batch")

    val afterB2g = emissions(1).filter(_.group == "g").map(m => (m.key, m.weight)).toSet
    val afterB2h = emissions(1).filter(_.group == "h").map(m => (m.key, m.weight)).toSet
    val expect = batchSample(b1 ++ b2, k)
    assert(afterB2g === expect("g"), "prefix-2 sample drifted from batch")
    assert(afterB2h === expect("h"))
  }

  test("each emission is the complete sample, bounded at k") {
    val batches = (0 until 5).map(b =>
      (0 until 100).map(i => El("g", s"k_${b}_$i", (i % 9) + 1L)).toSeq)
    val emissions = runStream(batches, k = 4)
    emissions.foreach { e =>
      assert(e.length === 4, s"emission of ${e.length} rows, expected the full k=4 sample")
    }
    // final emission = batch twin over everything
    val fin = emissions.last.map(m => (m.key, m.weight)).toSet
    assert(fin === batchSample(batches.flatten, 4)("g"))
  }

  test("weight dominance: heavy keys crowd out light ones; ≡ batch twin") {
    val els = (0 until 10).map(i => El("g", s"heavy_$i", 1000L)) ++
      (0 until 90).map(i => El("g", s"light_$i", 1L))
    val sample = runStream(Seq(els), k = 8).head.map(_.key)
    assert(sample.count(_.startsWith("heavy_")) >= 6, s"sample: ${sample.mkString(",")}")
    assert(sample.toSet === batchSample(els, 8)("g").map(_._1))
  }

  test("re-observing a key with the same weight is a no-op") {
    val b1 = (0 until 30).map(i => El("g", s"key_$i", (i % 3) + 1L))
    val emissions = runStream(Seq(b1, b1, b1), k = 6) // same batch thrice
    val sets = emissions.map(_.map(m => (m.key, m.weight)).toSet)
    assert(sets(0) === sets(1) && sets(1) === sets(2))
    assert(sets(0) === batchSample(b1, 6)("g"))
  }
}
