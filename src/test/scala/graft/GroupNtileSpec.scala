package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GroupNtile

/** GroupNtile (x103): the class-table rank decomposition must agree
  * row-for-row with Spark's own partitioned ntile()/row_number() — the
  * definitionally-correct (but skew-funneling) form — on seeded data
  * with heavy ties, undersized groups, and a degenerate single class.
  */
class GroupNtileSpec extends SparkSpec {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame, tiles: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("tile", ntile(tiles).over(w).cast("long"))
  }

  private def check(rows: Seq[(String, Long, Long)], tiles: Int): Unit = {
    val df = rows.toDF("g", "s", "id")
    val got = GroupNtile.withGroupNtile(df, "g", "s", "id", tiles)
      .select("g", "s", "id", "rank", "tile").collect().toSet
    val want = reference(df, tiles)
      .select("g", "s", "id", "rank", "tile").collect().toSet
    assert(got === want)
  }

  test("seeded random with heavy ties matches partitioned ntile exactly") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map(i =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(7).toLong, i.toLong))
    check(rows, 3)
    check(rows, 5)
  }

  test("groups smaller than the tile count degenerate to tile = rank") {
    check(Seq(("a", 9L, 1L), ("a", 3L, 2L), ("b", 1L, 3L)), 5)
  }

  test("one giant tie class still yields a total order and balanced tiles") {
    val rows = (0 until 100).map(i => ("g", 7L, i.toLong))
    check(rows, 3)
    val out = GroupNtile.withGroupNtile(rows.toDF("g", "s", "id"), "g", "s", "id", 3)
    val sizes = out.groupBy("tile").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes === Map(1L -> 34L, 2L -> 33L, 3L -> 33L))
  }

  test("exact remainder distribution: first (n mod t) tiles get the extra row") {
    // n = 10, t = 4 → sizes 3,3,2,2
    val rows = (0 until 10).map(i => ("g", (10 - i).toLong, i.toLong))
    val out = GroupNtile.withGroupNtile(rows.toDF("g", "s", "id"), "g", "s", "id", 4)
      .groupBy("tile").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 2L))
    check(rows, 4)
  }
}
