package graft

import org.apache.spark.sql.functions._

/** Pins the q25 scale story: approx_count_distinct (HLL++, fixed-size
  * sketch state, mergeable across partitions — the 100 TB path where an
  * exact distinct's expand would double the shuffle) stays within its
  * configured relative standard deviation of the exact count.
  */
class DistinctCountSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within rsd bound of exact countDistinct") {
    // 40k rows over ~7.3k distinct keys, deterministic (no rand()):
    // key = i*i mod 7331 spreads collisions unevenly like a real id column.
    val df = spark
      .range(40000)
      .select((col("id") * col("id") % 7331L).as("k"), (col("id") % 4).as("g"))
    val rows = df
      .groupBy($"g")
      .agg(
        countDistinct($"k").as("exact"),
        approx_count_distinct($"k", 0.02).as("approx")
      )
      .collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      val relErr = math.abs(approx - exact) / exact
      // 0.02 rsd → 3 sigma = 6%; use 8% for slack against unlucky hashing
      assert(relErr < 0.08, s"g=${r.get(0)}: exact=$exact approx=$approx relErr=$relErr")
    }
  }
}
