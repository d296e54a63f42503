package graft

import org.apache.spark.sql.functions._
import graft.operators.Robust

class RobustSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)], k10: Int = 35) =
    Robust
      .madOutliers(rows.toDF("k", "v"), col("k"), col("v"), k10)
      .orderBy(col("graft_key"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))

  test("median/MAD on an odd run with one gross outlier") {
    // values 1..9 plus 1000: med of 10 = 5.5, |dev| = 4.5..994.5,
    // mad = median(0.5,1.5,2.5,3.5,4.5,0.5,1.5,2.5,3.5,994.5) = 2.5+0.5=... compute:
    // sorted devs: 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5 → med = 2.5
    // threshold 3.5*2.5 = 8.75 → only the 994.5 dev is an outlier
    val vals = (1 to 9).map(i => ("a", i.toDouble)) :+ (("a", 1000.0))
    val out = run(vals)
    assert(out.toSeq === Seq(("a", 5.5, 2.5, 10L, 1L)))
  }

  test("mean/stddev would be fooled where MAD is not (breakdown robustness)") {
    // half the mass at 0, half spread: med = mad-stable; classic z-score
    // with the outlier inflating stddev would flag nothing
    val vals = Seq.fill(20)(("a", 10.0)) ++ Seq(("a", 10.5), ("a", 1e9))
    val out = run(vals)
    val (_, med, mad, n, outliers) = out(0)
    assert(med === 10.0 && n === 22L)
    // mad = 0 → any nonzero deviation is flagged (strict >)
    assert(mad === 0.0)
    assert(outliers === 2L) // 10.5 and 1e9; the 10.0 mass has dev 0, not > 0
  }

  test("winsor bounds: exact quantile edges and strict-inequality clip counts") {
    // values 1..20 in one group: p05 = 1.95, p95 = 19.05 (type-7);
    // below: {1} (1 < 1.95); above: {20}
    val vals = (1 to 20).map(i => ("a", i.toDouble))
    val out = Robust
      .winsorBounds(vals.toDF("k", "v"), col("k"), col("v"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(("a", 1.95, 19.05, 1L, 1L, 20L)))
  }

  test("groups are independent and k is honored") {
    val vals = (1 to 9).map(i => ("a", i.toDouble)) ++ Seq(("b", 1.0), ("b", 2.0), ("b", 3.0))
    val strict = run(vals, k10 = 10) // k = 1.0: |dev| > mad
    val a = strict.find(_._1 == "a").get
    val b = strict.find(_._1 == "b").get
    // a: med 5, devs 0..4, mad 2 → outliers = devs {3,4} × 2 sides = 4
    assert(a._2 === 5.0 && a._3 === 2.0 && a._5 === 4L)
    // b: med 2, mad 1 → no dev exceeds 1 strictly... devs are 1,0,1 → 0
    assert(b._5 === 0L)
  }

  /** Brute-force discrete quantile: value at 0-based rank (p·(n−1)) div
    * pDenom of the sorted group.
    */
  private def refQuantile(vs: Seq[Long], pNum: Long, pDenom: Long): (Long, Long, Long) = {
    val sorted = vs.sorted
    val r = pNum * (vs.size - 1) / pDenom
    (vs.size.toLong, r, sorted(r.toInt))
  }

  private def runBinned(
      rows: Seq[(String, Long)], pNum: Long, pDenom: Long, shift: Int,
      parts: Int = 0) = {
    val df0 = rows.toDF("k", "v")
    val df = if (parts > 0) df0.repartition(parts) else df0
    Robust
      .binnedQuantileDisc(df, col("k"), col("v"), pNum, pDenom, shift)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("binned quantile: exact parity with sorted selection across p, shift, partitioning") {
    // deterministic scattered values incl. negatives and heavy duplicates
    val a = (0 until 500).map(i => ("a", ((i * 37) % 1000 - 200).toLong))
    val b = (0 until 101).map(i => ("b", (i % 7).toLong)) // 7 distinct, mega-duplicated
    val rows = a ++ b
    for {
      (pn, pd) <- Seq((0L, 1L), (1L, 2L), (95L, 100L), (1L, 1L))
      shift <- Seq(0, 4, 10, 40) // 40: every value in ONE bin (degenerate = plain sort)
      parts <- Seq(0, 13)
    } {
      val got = runBinned(rows, pn, pd, shift, parts)
      assert(got("a") === refQuantile(a.map(_._2), pn, pd), s"a p=$pn/$pd shift=$shift")
      assert(got("b") === refQuantile(b.map(_._2), pn, pd), s"b p=$pn/$pd shift=$shift")
    }
  }

  test("burst screen: hand-built buckets, all-equal flags nothing, exact boundary is NOT a burst") {
    // key a: four quiet hours of 10 + one spike of 24 → only the spike
    //   flags (med2=20, dev2=28, mad4=0 → 112 > 0)
    // key b: all equal → MAD 0, zero deviation, nothing flags
    // key c: counts (2,4,11) → med2=8, dev2=(4,0,14), mad4=8; the 11
    //   bucket sits EXACTLY at 4·14 = 7·8 = 56 → strict > must NOT flag
    val events =
      (0 until 4).flatMap(bk => Seq.fill(10)(("a", bk.toLong))) ++
        Seq.fill(24)(("a", 4L)) ++
        (0 until 3).flatMap(bk => Seq.fill(5)(("b", bk.toLong))) ++
        Seq.fill(2)(("c", 0L)) ++ Seq.fill(4)(("c", 1L)) ++ Seq.fill(11)(("c", 2L))
    val got = Robust
      .burstScreen(events.toDF("k", "bk"), col("k"), col("bk"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got(("a", 4L)) === ((24L, true)))
    (0 until 4).foreach(bk => assert(got(("a", bk.toLong)) === ((10L, false))))
    (0 until 3).foreach(bk => assert(got(("b", bk.toLong)) === ((5L, false))))
    assert(got(("c", 2L)) === ((11L, false)), "exact 4*dev2 == 7*mad4 boundary must not flag")
    assert(got(("c", 0L))._2 === false && got(("c", 1L))._2 === false)
  }

  test("binned quantile: the selection join touches only the target bin's rows") {
    // 1000 values spread over ~63 bins (shift 4): the post-join sort must
    // see ~n/63 rows, not n — pin via the plan (broadcast join + filter
    // on the bin equality) and via the answer still being exact
    val rows = (0 until 1000).map(i => ("a", ((i * 7919) % 1009).toLong))
    val df = Robust.binnedQuantileDisc(
      rows.toDF("k", "v"), col("k"), col("v"), 1, 2, 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast bin-target join:\n$plan")
    assert(runBinned(rows, 1, 2, 4)("a") === refQuantile(rows.map(_._2), 1, 2))
  }
  test("rankNormalizePpm: exact endpoints, tie-break order, singleton zero") {
    val df = Seq((10L, 5L), (11L, 2L), (12L, 9L), (13L, 5L)).toDF("id", "score")
    val got = Robust
      .rankNormalizePpm(df, Seq(col("score"), col("id")))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    // order: (2,11) < (5,10) < (5,13) < (9,12); ppm = (rank-1)*1e6 div 3
    assert(got === Set(
      (11L, 1L, 0L), (10L, 2L, 333333L), (13L, 3L, 666666L), (12L, 4L, 1000000L)))
    val one = Robust.rankNormalizePpm(Seq((1L, 7L)).toDF("id", "score"),
      Seq(col("score"), col("id"))).collect()
    assert(one.length === 1 && one(0).getLong(3) === 0L)
  }

  test("rankNormalizePpm: parity with a single-window reference on 2k rows, any partitioning") {
    val rows = (0 until 2000).map(i => (i.toLong, ((i * 7919) % 997).toLong))
    val want = rows.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i.toLong * 1000000L / 1999L) }.toMap
    for (p <- Seq(1, 8)) {
      val got = Robust
        .rankNormalizePpm(rows.toDF("id", "score").repartition(p), Seq(col("score"), col("id")))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got === want, s"parts=$p")
    }
  }
}
