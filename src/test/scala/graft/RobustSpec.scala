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
}
