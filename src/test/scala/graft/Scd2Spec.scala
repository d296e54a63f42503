package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def compress(rows: Seq[(Long, String, Long, Long)]) =
    Scd2
      .compressHistory(
        rows.toDF("user_id", "state", "ts", "event_id"),
        keyCol = col("user_id"),
        stateCol = col("state"),
        orderCols = Seq(col("ts"), col("event_id")),
        validityCol = col("ts")
      )
      .orderBy(col("graft_key"), col("valid_from"))
      .collect()
      .map(r =>
        (r.getLong(0), Option(r.getString(1)).orNull,
          r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))

  test("A→B→A re-entry produces three islands, not two (the groupBy-state bug)") {
    val out = compress(Seq(
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L),
      (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L)
    ))
    assert(out.toSeq === Seq(
      (1L, "A", 10L, 30L, 2L),
      (1L, "B", 30L, 40L, 1L),
      (1L, "A", 40L, -1L, 1L)
    ))
  }

  test("intervals chain: valid_to equals the next island's valid_from; last is open") {
    val out = compress(Seq(
      (7L, "x", 100L, 1L), (7L, "y", 200L, 2L), (7L, "z", 300L, 3L)
    ))
    assert(out.map(_._3).toSeq === Seq(100L, 200L, 300L))
    assert(out.map(_._4).toSeq === Seq(200L, 300L, -1L))
  }

  test("keys are independent; null state is its own run value") {
    val out = compress(Seq(
      (1L, "A", 10L, 1L),
      (2L, null, 10L, 2L), (2L, null, 20L, 3L), (2L, "A", 30L, 4L)
    ))
    assert(out.toSeq === Seq(
      (1L, "A", 10L, -1L, 1L),
      (2L, null, 10L, 30L, 2L),
      (2L, "A", 30L, -1L, 1L)
    ))
  }

  test("ties in the validity column are broken by the id order column") {
    // two states at the same ts — event_id decides run order deterministically
    val out = compress(Seq((1L, "B", 10L, 2L), (1L, "A", 10L, 1L)))
    assert(out.map(_._2).toSeq === Seq("A", "B"))
  }

  test("one hash exchange total: lag, island sum, aggregation, and lead reuse the key partitioning") {
    val df = Scd2.compressHistory(
      Seq((1L, "A", 10L, 1L)).toDF("user_id", "state", "ts", "event_id"),
      keyCol = col("user_id"),
      stateCol = col("state"),
      orderCols = Seq(col("ts"), col("event_id")),
      validityCol = col("ts")
    )
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly 1 hash exchange, plan:\n$plan")
  }
}
