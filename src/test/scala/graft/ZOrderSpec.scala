package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton code is a bijection: zInverse(zValue) round-trips both dims") {
    val pts = for { a <- 0 until 64; b <- Seq(0, 1, 17, 42, 63) } yield (a, b)
    val bad = pts
      .toDF("a", "b")
      .withColumn("z", ZOrder.zValue(col("a"), col("b"), 6))
      .withColumn("ra", ZOrder.zInverse(col("z"), 6, even = true))
      .withColumn("rb", ZOrder.zInverse(col("z"), 6, even = false))
      .where(col("ra") =!= col("a") || col("rb") =!= col("b"))
      .count()
    assert(bad === 0L)
  }

  test("morton code matches the hand-computed interleave on known points") {
    // a=0b11 (even bits), b=0b01 (odd bits) → z = 0b0111 = 7
    val got = Seq((3, 1), (0, 0), (1, 0), (0, 1), (7, 7))
      .toDF("a", "b")
      .withColumn("z", ZOrder.zValue(col("a"), col("b"), 3))
      .collect()
      .map(_.getInt(2))
      .toSeq
    assert(got === Seq(7, 0, 1, 2, 63))
  }

  // wide pseudo-random grid covering both 10-bit dims (tiny-SF parquet key
  // ranges are too narrow — 10 suppliers — to exercise the span geometry)
  private def grid = (0 until 4096)
    .map(i => ((i * 37) % 1024, (i * 101) % 1024))
    .toDF("a", "b")

  test("zone spans are bounded in BOTH dims: 16 zones over 10-bit dims fix the top 2 bits of each") {
    val spans = ZOrder
      .zoneSpans(grid, col("a"), col("b"), bits = 10, buckets = 16)
      .collect()
    assert(spans.length === 16)
    spans.foreach { r =>
      val (minA, maxA) = (r.getLong(2), r.getLong(3))
      val (minB, maxB) = (r.getLong(4), r.getLong(5))
      assert(maxA - minA <= 255, s"zone ${r.getLong(0)}: a-span ${maxA - minA} > 255")
      assert(maxB - minB <= 255, s"zone ${r.getLong(0)}: b-span ${maxB - minB} > 255")
      // and the zone's dims sit inside one aligned 256-wide tile
      assert(minA / 256 === maxA / 256 && minB / 256 === maxB / 256)
    }
  }

  test("single-column sort cannot give the second-dim bound z-order gives") {
    // the comparison behind the operator: zone the same data by a alone
    // (perfect a-locality) and the b-span blows out to ~full range
    val worstB = grid
      .withColumn("zone", expr("a div 64")) // 16 equal-width zones of a 10-bit dim
      .groupBy("zone")
      .agg((max("b") - min("b")).as("span_b"))
      .agg(max("span_b"))
      .collect()(0)
      .getInt(0)
    assert(worstB > 255, s"a-sorted zones unexpectedly bounded b (span $worstB)")
  }
}
