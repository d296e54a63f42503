package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 101L, 50L, 5.0),  // before any right row → NULL match
    (1L, 102L, 100L, 6.0), // equal ts → matches the ts=100 right row
    (1L, 103L, 250L, 7.0), // matches latest ≤ 250 (ts=200), not ts=100
    (2L, 201L, 999L, 8.0)  // other key: isolated, matches its own state
  ).toDF("user_id", "event_id", "ts", "value")

  private lazy val right = Seq(
    (1L, 100L, 10.0),
    (1L, 200L, 20.0),
    (2L, 900L, 90.0),
    (3L, 1L, 99.0) // key with no left rows: must not leak anywhere
  ).toDF("user_id", "state_ts", "state_value")

  test("backward as-of: latest right row at or before each left ts, per key") {
    val out = AsofJoin
      .backward(left, right, Seq("user_id"), "ts", "state_ts")
      .collect()
      .map(r => r.getLong(1) -> ((Option(r.get(4)).map(_.asInstanceOf[Long]), Option(r.get(5)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(101L) === ((None, None)))
    assert(out(102L) === ((Some(100L), Some(10.0))))
    assert(out(103L) === ((Some(200L), Some(20.0))))
    assert(out(201L) === ((Some(900L), Some(90.0))))
    assert(out.size === 4) // exactly the left rows, nothing from key 3
  }

  test("output schema: all left columns then right payload columns") {
    val cols = AsofJoin.backward(left, right, Seq("user_id"), "ts", "state_ts").columns.toSeq
    assert(cols === Seq("user_id", "event_id", "ts", "value", "state_ts", "state_value"))
  }

  test("collision guard: overlapping non-key column names are rejected") {
    val bad = right.withColumnRenamed("state_value", "value")
    intercept[IllegalArgumentException] {
      AsofJoin.backward(left, bad, Seq("user_id"), "ts", "state_ts")
    }
  }

  test("forward as-of: earliest right row at or after each left ts") {
    val out = AsofJoin
      .forward(left, right, Seq("user_id"), "ts", "state_ts")
      .collect()
      .map(r => r.getLong(1) -> Option(r.get(4)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out(101L) === Some(100L)) // next state after ts=50
    assert(out(102L) === Some(100L)) // equal ts matches (>= semantics)
    assert(out(103L) === None) // nothing at or after 250 for key 1
    assert(out(201L) === None) // key 2's only state is at 900 < 999
  }

  test("forward restores original timestamp signs in the output") {
    val row = AsofJoin
      .forward(left, right, Seq("user_id"), "ts", "state_ts")
      .where(col("event_id") === 101L)
      .collect()(0)
    assert(row.getLong(2) === 50L && row.getLong(4) === 100L)
  }

  test("plan: one exchange for the as-of itself (no nested-loop join)") {
    val plan = AsofJoin
      .backward(left, right, Seq("user_id"), "ts", "state_ts")
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect { case e: Exchange => e }.length === 1)
    assert(plan.toString.indexOf("NestedLoop") === -1)
  }
}
