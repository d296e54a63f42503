package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 10L, 5L),   // inside iv A only
    (1L, 11L, 100L), // inside A and B (overlap region)
    (1L, 12L, 150L), // inside B only
    (1L, 13L, 999L), // inside nothing
    (2L, 20L, 5L)    // other key: would be inside A's span but key differs
  ).toDF("user_id", "pt_id", "ts")

  private lazy val intervals = Seq(
    (1L, 100L, 0L, 100L),  // A
    (1L, 101L, 90L, 200L), // B (overlaps A)
    (2L, 102L, 500L, 600L) // other key, empty
  ).toDF("user_id", "iv_id", "start_ts", "end_ts")

  private def run(binWidth: Long): Set[(Long, Long)] =
    RangeJoin
      .binned(points, intervals, Seq("user_id"), "ts", "start_ts", "end_ts", binWidth)
      .select("pt_id", "iv_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  private val expected = Set((10L, 100L), (11L, 100L), (11L, 101L), (12L, 101L))

  test("containment pairs: overlaps multi-match, bounds inclusive, keys isolated") {
    assert(run(binWidth = 50L) === expected)
  }

  test("result is bin-width invariant (each pair exactly once at any width)") {
    for (w <- Seq(1L, 7L, 100L, 1000L)) {
      val rows = RangeJoin
        .binned(points, intervals, Seq("user_id"), "ts", "start_ts", "end_ts", w)
        .select("pt_id", "iv_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet === expected, s"binWidth=$w")
      assert(rows.length === expected.size, s"duplicates at binWidth=$w")
    }
  }

  test("boundary points: exact start and exact end both match (BETWEEN)") {
    val pts = Seq((1L, 30L, 0L), (1L, 31L, 100L)).toDF("user_id", "pt_id", "ts")
    val out = RangeJoin
      .binned(pts, intervals, Seq("user_id"), "ts", "start_ts", "end_ts", 64L)
      .select("pt_id", "iv_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(out.contains((30L, 100L)) && out.contains((31L, 100L)))
  }
}
