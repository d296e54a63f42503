package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Preference
import graft.streaming.BtRatingStream
import graft.streaming.BtRatingStream.Comparison

/** The eighteenth batch/stream twin — the preference family's streaming
  * member: after every micro-batch, `ratings()` over the maintained
  * event set must equal batch [[Preference.btRatings]] over every
  * comparison delivered so far, rating-for-rating (view-forced: the MM
  * denominators couple all items, so one new duel moves every rating).
  * Includes the family's distinguishing structural case: two
  * INDEPENDENT duels with identical participants and outcome (distinct
  * cmp_id) are both evidence and must both count, while a replayed
  * event row must collapse.
  */
class BtRatingStreamSpec extends SparkSpec {
  import spark.implicits._

  // a deterministic 40-duel log over 6 items: i beats j when
  // (5·cmp_id + i) % 3 != 0, with deliberate repeat match-ups
  private val allCmps: Seq[(Long, Long, Long, Long)] =
    (0L until 40L).map { id =>
      val a = id % 6L
      val b = (id + 1L + id % 3L) % 6L
      val winner = if ((5L * id + a) % 3L != 0L) a else b
      (id, a, b, winner)
    }.filter { case (_, a, b, _) => a != b }

  private def batchFit(cmps: Seq[(Long, Long, Long, Long)]): Seq[Seq[Long]] =
    Preference
      .btRatings(
        cmps.toDF("cmp_id", "item_a", "item_b", "winner")
          .select("item_a", "item_b", "winner"),
        rounds = 4)
      .orderBy("item")
      .collect()
      .map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  private def streamFit(m: BtRatingStream.Maintainer): Seq[Seq[Long]] =
    m.ratings()
      .orderBy("item")
      .collect()
      .map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  private def toDf(cmps: Seq[(Long, Long, Long, Long)]) =
    cmps.toDF("cmp_id", "item_a", "item_b", "winner")

  test("ratings() ≡ batch btRatings after every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Comparison]
    val m = new BtRatingStream.Maintainer(spark)
    val query = BtRatingStream.start(input.toDS(), m)
    try {
      var prefix = Seq.empty[(Long, Long, Long, Long)]
      Seq(allCmps.take(10), allCmps.slice(10, 25), allCmps.drop(25)).foreach { b =>
        input.addData(b.map { case (id, a, x, w) => Comparison(id, a, x, w) }: _*)
        query.processAllAvailable()
        prefix ++= b
        assert(streamFit(m) === batchFit(prefix))
      }
    } finally query.stop()
  }

  test("independent identical duels both count; replayed rows collapse") {
    val m = new BtRatingStream.Maintainer(spark)
    // two distinct events, same participants and outcome
    val twice = Seq((100L, 1L, 2L, 1L), (101L, 1L, 2L, 1L), (102L, 2L, 3L, 2L))
    m.update(toDf(twice))
    assert(streamFit(m) === batchFit(twice))
    assert(m.state.count() === 3L)
    // item 1's win column reflects BOTH duels
    val wins1 = m.ratings().where(col("item") === 1L).collect()(0).getLong(2)
    assert(wins1 === 2L)
    // crash re-delivery of the same rows is a no-op
    m.update(toDf(twice))
    assert(m.state.count() === 3L)
    assert(streamFit(m) === batchFit(twice))
    // an overlapping batch folds only its new events
    m.update(toDf(Seq((101L, 1L, 2L, 1L), (103L, 3L, 1L, 3L))))
    assert(streamFit(m) === batchFit(twice :+ ((103L, 3L, 1L, 3L))))
  }

  test("stateDir restart + replay + continuation across a fresh Maintainer") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bt_state").toString
    val m1 = new BtRatingStream.Maintainer(spark, stateDir = Some(dir))
    assert(!m1.resumed)
    m1.update(toDf(allCmps.take(10)), epochId = 0L)
    m1.update(toDf(allCmps.slice(10, 25)), epochId = 1L)
    val before = streamFit(m1)

    val m2 = new BtRatingStream.Maintainer(spark, stateDir = Some(dir))
    assert(m2.resumed)
    assert(streamFit(m2) === before)
    m2.update(toDf(allCmps.slice(10, 25)), epochId = 1L) // replay no-op
    assert(streamFit(m2) === before)
    m2.update(toDf(allCmps.drop(25)), epochId = 2L)
    assert(streamFit(m2) === batchFit(allCmps))
  }

  test("delta epochs compact: GC'd chain, restart over compact+delta ≡ full build") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bt_compact").toString
    val m1 = new BtRatingStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    m1.update(toDf(allCmps.take(10)), epochId = 0L)      // delta
    m1.update(toDf(allCmps.slice(10, 25)), epochId = 1L) // compact
    m1.update(toDf(allCmps.drop(25)), epochId = 2L)      // delta
    assert(!new java.io.File(dir, "commits/0").exists, "epoch 0 should be GC'd")
    assert(new java.io.File(dir, "compacts/1").exists)
    val m2 = new BtRatingStream.Maintainer(spark, stateDir = Some(dir), compactEvery = 2)
    assert(m2.resumed)
    assert(streamFit(m2) === batchFit(allCmps))
  }

  test("checkpoint without stateDir is refused") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Comparison]
    val m = new BtRatingStream.Maintainer(spark)
    val cp = java.nio.file.Files.createTempDirectory("graft_bt_cp").toString
    val e = intercept[IllegalArgumentException] {
      BtRatingStream.start(input.toDS(), m, checkpoint = Some(cp))
    }
    assert(e.getMessage.contains("stateDir"))
  }
}
