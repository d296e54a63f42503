package graft

import graft.operators.Preference

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def fit(cmp: Seq[(Long, Long, Long)], rounds: Int = 4) =
    Preference
      .btRatings(cmp.toDF("item_a", "item_b", "winner"), rounds)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("one round on a 2-item duel reproduces the hand-computed MM update") {
    // items 1,2; three comparisons, 1 wins twice. S = 1e6, w0 = S each.
    //   t_12  = 3·S² div 2S = 1_500_000
    //   raw_1 = 2·S² div t = 1_333_333; raw_2 = 1·S² div t = 666_666
    //   mx div S = 1 → normalization is identity
    val out = fit(Seq((1L, 2L, 1L), (1L, 2L, 1L), (2L, 1L, 2L)), rounds = 1)
    assert(out(1L) === ((3L, 2L, 1333333L, 1L)))
    assert(out(2L) === ((3L, 1L, 666666L, 2L)))
  }

  test("an undefeated item takes rank 1 and the zero-win item rates 0") {
    val cmp = Seq(
      (1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L),
      (1L, 2L, 1L), (2L, 3L, 2L))
    val out = fit(cmp)
    assert(out(1L)._4 === 1L) // rank
    assert(out(3L)._2 === 0L) // wins
    assert(out(3L)._3 === 0L) // rating collapses to 0 for a winless item
    assert(out(1L)._3 > out(2L)._3 && out(2L)._3 > out(3L)._3)
  }

  test("symmetric records give equal ratings; ranks tie-break by item asc") {
    val cmp = Seq((5L, 9L, 5L), (5L, 9L, 9L), (5L, 9L, 5L), (5L, 9L, 9L))
    val out = fit(cmp)
    assert(out(5L)._3 === out(9L)._3)
    assert(out(5L)._4 === 1L && out(9L)._4 === 2L)
  }

  test("self-pairs are dropped, not counted as comparisons or wins") {
    val out = fit(Seq((7L, 7L, 7L), (1L, 2L, 1L)))
    assert(!out.contains(7L))
    assert(out(1L)._1 === 1L && out(1L)._2 === 1L)
  }

  test("orientation-insensitive: (a,b) and (b,a) logs fit identically") {
    val ab = fit(Seq((1L, 2L, 1L), (1L, 2L, 1L), (1L, 2L, 2L), (2L, 3L, 2L)))
    val ba = fit(Seq((2L, 1L, 1L), (1L, 2L, 1L), (2L, 1L, 2L), (3L, 2L, 2L)))
    assert(ab === ba)
  }

  test("MM converges toward the BT solution: transitive strength ordering " +
    "on a chain corpus with mixed results") {
    // 1 beats 2 most of the time, 2 beats 3 most of the time, no direct
    // 1-3 games: BT infers 1 > 2 > 3 through the chain.
    val cmp =
      Seq.fill(8)((1L, 2L, 1L)) ++ Seq.fill(2)((1L, 2L, 2L)) ++
        Seq.fill(8)((2L, 3L, 2L)) ++ Seq.fill(2)((2L, 3L, 3L))
    val out = fit(cmp, rounds = 8)
    assert(out(1L)._3 > out(2L)._3 && out(2L)._3 > out(3L)._3)
    assert(out(1L)._4 === 1L && out(2L)._4 === 2L && out(3L)._4 === 3L)
  }

  test("curatedPairs: margins, agreement, and the keep gate on an upset log") {
    // item 1 dominates item 2 (4 wins to 1): the single upset (cmp 104,
    // winner 2) must come out agree = false with a negative margin
    val cmp = Seq(
      (100L, 1L, 2L, 1L), (101L, 1L, 2L, 1L), (102L, 2L, 1L, 1L),
      (103L, 1L, 2L, 1L), (104L, 1L, 2L, 2L))
    val cmpDf = cmp.toDF("cmp_id", "item_a", "item_b", "winner")
    val ratings = Preference.btRatings(
      cmpDf.select("item_a", "item_b", "winner"), rounds = 4)
    val out = Preference.curatedPairs(cmpDf, ratings, minMargin = 100000L)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5), r.getBoolean(6), r.getBoolean(7)))
      .toMap
    val rMap = ratings.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val gap = rMap(1L) - rMap(2L)
    assert(gap > 0L)
    // the four wins of item 1: chosen=1, rejected=2, margin=+gap
    Seq(100L, 101L, 102L, 103L).foreach { id =>
      assert(out(id) === ((1L, 2L, gap, true, gap >= 100000L)), s"cmp $id")
    }
    // the upset: chosen=2 (the observed winner), margin negative, dropped
    assert(out(104L) === ((2L, 1L, -gap, false, false)))
  }

  test("curatedPairs: ratings broadcast onto the log, self-pairs dropped") {
    val cmpDf = Seq((1L, 5L, 5L, 5L), (2L, 5L, 6L, 5L))
      .toDF("cmp_id", "item_a", "item_b", "winner")
    val ratings = Preference.btRatings(
      cmpDf.select("item_a", "item_b", "winner"), rounds = 2)
    val out = Preference.curatedPairs(cmpDf, ratings, minMargin = 0L).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
    val plan = Preference.curatedPairs(cmpDf, ratings, minMargin = 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "ratings lookup should broadcast")
  }

  test("a pair count past the fixed-point headroom fails loudly, never wraps") {
    // 2^63 / S^2 ≈ 9.2e6: one pair with more comparisons than that would
    // silently wrap t_ij negative in Long (and diverge from the oracle's
    // BIGINT, which errors) — the guard must throw first
    import org.apache.spark.sql.functions._
    val cmp = spark.range(9300000L).select(
      lit(1L).as("item_a"), lit(2L).as("item_b"), lit(1L).as("winner"))
    val e = intercept[IllegalArgumentException] {
      Preference.btRatings(cmp, rounds = 1)
    }
    assert(e.getMessage.contains("headroom"))
  }

  test("a pair set past the driver-fixpoint bound fails loudly BEFORE " +
    "the collect materializes it") {
    // the r13 verdict defect: the headroom requires fired only after the
    // driver had already collected the pair array — a 10⁸-pair log would
    // OOM before any guard. The limit(maxPairs+1) guard trips first.
    import org.apache.spark.sql.functions._
    val cmp = spark.range(12L).select( // 12 distinct pairs vs bound 5
      lit(0L).as("item_a"), (col("id") + 1L).as("item_b"), lit(0L).as("winner"))
    val e = intercept[IllegalArgumentException] {
      Preference.btRatings(cmp, rounds = 1, maxPairs = 5)
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("per-item denominator overflow fails loudly, never wraps (addExact)") {
    // engineered so round 2 sums two ≈2⁶³-sized t terms at one item:
    // pairs (1,2) and (1,3) each carry exactly maxSafe comparisons whose
    // winner is an OUTSIDE id, so items 1,2,3 are winless → all ratings
    // collapse to 0 after round 1 → round 2's t = n·S²/max(0,1) = n·S²
    // ≈ 2⁶³ per pair, and denom(1) = t+t wraps in unguarded Long where
    // the oracle's BIGINT sum would not
    import org.apache.spark.sql.functions._
    val n = Long.MaxValue / (1000000L * 1000000L) // the per-pair headroom
    val pair12 = spark.range(n).select(
      lit(1L).as("item_a"), lit(2L).as("item_b"), lit(998L).as("winner"))
    val pair13 = spark.range(n).select(
      lit(1L).as("item_a"), lit(3L).as("item_b"), lit(999L).as("winner"))
    val e = intercept[IllegalArgumentException] {
      Preference.btRatings(pair12.unionAll(pair13), rounds = 2)
    }
    assert(e.getMessage.contains("denominator overflowed"))
  }

  test("btRatingsDistributed ≡ btRatings bit-for-bit across log shapes") {
    // the distributed MM formulation lifts the driver-fixpoint contract;
    // every step is the same truncating integer arithmetic, so the fits
    // must be EQUAL, not just close — on duels, chains, upsets, ties
    val logs = Seq(
      Seq((1L, 2L, 1L), (1L, 2L, 1L), (2L, 1L, 2L)),
      Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L), (1L, 2L, 1L), (2L, 3L, 2L)),
      Seq((5L, 9L, 5L), (5L, 9L, 9L), (5L, 9L, 5L), (5L, 9L, 9L)),
      Seq.fill(8)((1L, 2L, 1L)) ++ Seq.fill(2)((1L, 2L, 2L)) ++
        Seq.fill(8)((2L, 3L, 2L)) ++ Seq.fill(2)((2L, 3L, 3L)) ++
        Seq((7L, 7L, 7L)))
    for ((log, k) <- logs.zipWithIndex; rounds <- Seq(1, 4)) {
      val df = log.toDF("item_a", "item_b", "winner")
      val a = Preference.btRatings(df, rounds).orderBy("item")
        .collect().map(_.toSeq).toSeq
      val b = Preference.btRatingsDistributed(df, rounds).orderBy("item")
        .collect().map(_.toSeq).toSeq
      assert(a === b, s"log $k rounds $rounds diverged")
    }
  }

  test("btRatingsDistributed: empty and self-pair-only logs fit to empty") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("item_a", "item_b", "winner")
    assert(Preference.btRatingsDistributed(empty, 4).count() === 0L)
    val selfOnly = Seq((3L, 3L, 3L)).toDF("item_a", "item_b", "winner")
    assert(Preference.btRatingsDistributed(selfOnly, 4).count() === 0L)
  }

  test("btRatingsDistributed plans no single-partition window") {
    // the rank must come from the two-phase GlobalRank: a Window with an
    // empty partition spec would serialize every item through one task
    val cmp = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 3L))
      .toDF("item_a", "item_b", "winner")
    val plan = Preference.btRatingsDistributed(cmp, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") || !plan.contains("windowspecdefinition()"),
      "global window in the distributed BT plan")
    assert(plan.contains("__part") || plan.contains("ExistingRDD"),
      "two-phase rank machinery missing from the plan")
  }

  test("fixed-point scale: the max-normalized top rating stays in [S, 2S)") {
    // integer normalization divides by floor(mx/S): the top rating is
    // bounded by 2S − 1 (quotient ≥ 1) and ≥ S (divided by exactly its
    // own quotient), never unbounded drift across rounds
    val cmp = Seq.fill(5)((1L, 2L, 1L)) ++ Seq((1L, 2L, 2L))
    val out = fit(cmp, rounds = 8)
    val top = out.values.map(_._3).max
    assert(top >= 1000000L && top < 2000000L)
  }
}
