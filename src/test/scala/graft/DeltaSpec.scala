package graft

import org.apache.spark.sql.functions._
import graft.operators.Delta

/** Pins the snapshot-diff join's full semantics matrix
  * (main.py:266-330; FIXTURES.md §2-3):
  * hit / hit-with-garbage-state / miss / empty state / duplicate state rows.
  */
class DeltaSpec extends SparkSpec {
  import spark.implicits._

  // current batch: SYMBOL, Close, OI
  private val current = Seq(
    ("A", 10.0, 100L),
    ("B", 20.0, 200L),
    ("C", 30.0, 300L),
    ("D", 40.0, 400L)
  ).toDF("SYMBOL", "Close", "OI")

  test("hit: Open = prev Close, OI_Change = OI - prev OI (main.py:298-304)") {
    val state = Seq(("A", "9.5", "90", 1L)).toDF("SYMBOL", "Close", "OI", "state_seq")
    val out = Delta
      .applyDelta(current, Delta.prepareState(state, "state_seq"))
      .where($"SYMBOL" === "A")
      .select("Open", "OI_Change")
      .collect()(0)
    assert(out.getDouble(0) === 9.5)
    assert(out.getLong(1) === 10L)
  }

  test("miss: Open = 0, OI_Change = 0 (main.py:305-308)") {
    val state = Seq(("A", "9.5", "90", 1L)).toDF("SYMBOL", "Close", "OI", "state_seq")
    val out = Delta
      .applyDelta(current, Delta.prepareState(state, "state_seq"))
      .where($"SYMBOL" === "B")
      .select("Open", "OI_Change")
      .collect()(0)
    assert(out.getDouble(0) === 0.0)
    assert(out.getLong(1) === 0L)
  }

  test("hit with garbage state: coerced to 0 at build → OI_Change = OI - 0 = OI (main.py:284-285)") {
    val state = Seq(("C", "not_a_number", "junk", 1L)).toDF("SYMBOL", "Close", "OI", "state_seq")
    val out = Delta
      .applyDelta(current, Delta.prepareState(state, "state_seq"))
      .where($"SYMBOL" === "C")
      .select("Open", "OI_Change")
      .collect()(0)
    assert(out.getDouble(0) === 0.0)
    assert(out.getLong(1) === 300L) // NOT 0 — the reference's hit-with-NULL rule
  }

  test("empty state: all zeros (main.py:269-273)") {
    val state = Seq.empty[(String, String, String, Long)].toDF("SYMBOL", "Close", "OI", "state_seq")
    val out = Delta
      .applyDelta(current, Delta.prepareState(state, "state_seq"))
      .agg(sum($"Open"), sum(abs($"OI_Change")))
      .collect()(0)
    assert(out.getDouble(0) === 0.0)
    assert(out.getLong(1) === 0L)
  }

  test("duplicate state rows: last one wins (dict overwrite, main.py:281-286)") {
    val state = Seq(
      ("A", "1.0", "10", 1L),
      ("A", "2.0", "20", 2L) // later arrival — wins
    ).toDF("SYMBOL", "Close", "OI", "state_seq")
    val out = Delta
      .applyDelta(current, Delta.prepareState(state, "state_seq"))
      .where($"SYMBOL" === "A")
      .select("Open", "OI_Change")
      .collect()(0)
    assert(out.getDouble(0) === 2.0)
    assert(out.getLong(1) === 80L)
  }

  test("row-count invariant under the join (the reference's historical duplication bug)") {
    val state = Seq(
      ("A", "1.0", "10", 1L),
      ("A", "2.0", "20", 2L),
      ("B", "3.0", "30", 3L)
    ).toDF("SYMBOL", "Close", "OI", "state_seq")
    val n = Delta.applyDelta(current, Delta.prepareState(state, "state_seq")).count()
    assert(n === current.count())
  }
}
