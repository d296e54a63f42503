package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Calibration
import graft.streaming.CalibrationStream
import graft.streaming.CalibrationStream.ScoredDoc

/** The twentieth batch/stream twin — streaming isotonic calibration,
  * the pattern library's second ADDITIVE constant-size-state member
  * (after PcaStream): per-bin (n_pos, n_docs) counts fold by BIGINT
  * addition, so stream-folded state must be BIT-EQUAL to the batch
  * [[Calibration.fixedBinStats]] over the union after every
  * micro-batch, and the view-forced fit must equal the batch
  * [[Calibration.isotonicFitPpm]] over that state — proving the
  * additive-twin shape (ledger replay guard, save-before-swap,
  * durable-resync) generalizes beyond the moment sketch.
  */
class CalibrationStreamSpec extends SparkSpec {
  import spark.implicits._

  // deterministic scored docs: score ∈ [-1000, 1000], label correlated
  // with the score plus planted noise — a realistic miscalibrated scorer
  private val all: Seq[(Long, Long, Long)] = (0L until 600L).map { i =>
    val score = (i * 37) % 2001 - 1000
    val y = if (score > 150 || i % 7 == 0) 1L else -1L
    (i, score, y)
  }

  private def toDf(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("doc_id", "score", "y")

  /** Reference state + fit in plain Scala over the prefix — independent
    * of the fold (the refMoments discipline).
    */
  private def refState(rows: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] =
    rows
      .groupBy { case (_, s, _) =>
        math.min(math.max((s + 1000L) * 10 / 2000, 0L), 9L)
      }
      .map { case (b, xs) =>
        b -> ((xs.count(_._3 == 1L).toLong, xs.size.toLong))
      }

  private def refFit(rows: Seq[(Long, Long, Long)]): Seq[Long] = {
    val st = refState(rows)
    Calibration.isotonicFitPpm((0L until 10L).map(b => st.getOrElse(b, (0L, 0L))))
  }

  test("counts fold bit-equal to batch over every prefix; fit ≡ batch fit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ScoredDoc]
    val m = new CalibrationStream.Maintainer(spark)
    val query = CalibrationStream.start(input.toDS(), m)
    try {
      var prefix = Seq.empty[(Long, Long, Long)]
      Seq(all.take(100), all.slice(100, 350), all.drop(350)).foreach { b =>
        input.addData(b.map { case (id, s, y) => ScoredDoc(id, s, y) }: _*)
        query.processAllAvailable()
        prefix ++= b
        assert(m.state === refState(prefix))
        assert(m.fit() === refFit(prefix))
        // the batch operator over the union agrees with the fold
        val batchStats = Calibration.fixedBinStats(toDf(prefix), 10, -1000L, 1000L)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        assert(m.state === batchStats)
      }
      // the fit is monotone non-decreasing (isotonic by construction)
      val f = m.fit()
      assert(f.zip(f.tail).forall { case (a, b) => a <= b }, f.toString)
    } finally query.stop()
  }

  test("replayed committed epoch is a full no-op (the additive guard)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cal_replay").toString
    val m = new CalibrationStream.Maintainer(spark, stateDir = Some(dir))
    m.update(toDf(all.take(50)), epochId = 0L)
    val once = m.state
    m.update(toDf(all.take(50)), epochId = 0L) // crash re-delivery
    assert(m.state === once, "replay double-folded the additive counts")
    m.update(toDf(all.slice(50, 80)), epochId = 1L)
    assert(m.state === refState(all.take(80)))
  }

  test("stateDir restart + replay + continuation across a fresh Maintainer") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cal_state").toString
    val m1 = new CalibrationStream.Maintainer(spark, stateDir = Some(dir))
    assert(!m1.resumed)
    m1.update(toDf(all.take(200)), epochId = 0L)
    m1.update(toDf(all.slice(200, 350)), epochId = 1L)
    val before = m1.state

    val m2 = new CalibrationStream.Maintainer(spark, stateDir = Some(dir))
    assert(m2.resumed)
    assert(m2.state === before)
    m2.update(toDf(all.slice(200, 350)), epochId = 1L) // replay no-op
    assert(m2.state === before)
    m2.update(toDf(all.drop(350)), epochId = 2L)
    assert(m2.state === refState(all))
    assert(m2.fit() === refFit(all))
  }

  test("delta epochs compact: GC'd chain, restart over compact+delta sums exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cal_compact").toString
    val m1 = new CalibrationStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    m1.update(toDf(all.take(100)), epochId = 0L)       // delta
    m1.update(toDf(all.slice(100, 300)), epochId = 1L) // compact (merged)
    m1.update(toDf(all.drop(300)), epochId = 2L)       // delta
    assert(!new java.io.File(dir, "commits/0").exists, "epoch 0 should be GC'd")
    assert(new java.io.File(dir, "compacts/1").exists)
    val m2 = new CalibrationStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    assert(m2.resumed)
    // bit-equality is the additive-correctness proof: any double-count
    // between the compact frame and a surviving delta would shift sums
    assert(m2.state === refState(all))
  }

  test("an epoch BEHIND the ledger throws loudly instead of silently dropping") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cal_behind").toString
    val m = new CalibrationStream.Maintainer(spark, stateDir = Some(dir))
    m.update(toDf(all.take(30)), epochId = 0L)
    m.update(toDf(all.slice(30, 60)), epochId = 1L)
    val before = m.state
    val e = intercept[IllegalStateException] {
      m.update(toDf(all.slice(60, 90)), epochId = 0L) // fresh checkpoint, old state
    }
    assert(e.getMessage.contains("behind"))
    assert(m.state === before, "failed save must leave pre-batch state")
  }

  test("durable-committed but unfolded epoch resyncs from the store " +
    "(the additive twins' shared crash shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cal_resync").toString
    val m1 = new CalibrationStream.Maintainer(spark, stateDir = Some(dir))
    m1.update(toDf(all.take(50)), epochId = 0L)
    val m2 = new CalibrationStream.Maintainer(spark, stateDir = Some(dir))
    m1.update(toDf(all.slice(50, 80)), epochId = 1L) // durable ledger → 1
    // m2 never folded epoch 1; the ledger alone would skip it forever
    m2.update(toDf(all.slice(50, 80)), epochId = 1L)
    assert(m2.state === refState(all.take(80)),
      "replay of a durable-but-unfolded epoch must resync from the store")
    m2.update(toDf(all.slice(80, 120)), epochId = 2L)
    assert(m2.state === refState(all.take(120)))
  }

  test("empty batches fold as zero; out-of-range scores clamp to edge bins") {
    val m = new CalibrationStream.Maintainer(spark)
    m.update(toDf(all.take(10)))
    val once = m.state
    m.update(toDf(Seq.empty))
    assert(m.state === once)
    m.update(toDf(Seq((9000L, 5000L, 1L), (9001L, -5000L, -1L))))
    assert(m.state(9L)._1 === once.getOrElse(9L, (0L, 0L))._1 + 1L)
    assert(m.state(0L)._2 === once.getOrElse(0L, (0L, 0L))._2 + 1L)
  }

  test("a stateDir persisted under a different binning fails loudly at load") {
    // bins is a live contract (the PcaStream dim lesson): fit() iterates
    // 0..bins−1, so silently loading 20-bin state into a 10-bin
    // Maintainer would drop half the mass from every pooled rate
    val dir = java.nio.file.Files.createTempDirectory("graft_cal_bins").toString
    val m20 = new CalibrationStream.Maintainer(spark, stateDir = Some(dir), bins = 20)
    m20.update(toDf(all.take(100)), epochId = 0L)
    val e = intercept[IllegalStateException] {
      new CalibrationStream.Maintainer(spark, stateDir = Some(dir), bins = 10).state
    }
    assert(e.getMessage.contains("binning"))
  }

  test("checkpoint without stateDir is refused") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ScoredDoc]
    val m = new CalibrationStream.Maintainer(spark)
    val cp = java.nio.file.Files.createTempDirectory("graft_cal_cp").toString
    val e = intercept[IllegalArgumentException] {
      CalibrationStream.start(input.toDS(), m, checkpoint = Some(cp))
    }
    assert(e.getMessage.contains("stateDir"))
  }
}
