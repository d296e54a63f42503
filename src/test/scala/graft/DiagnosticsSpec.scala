package graft

import graft.operators.{Delta, Diagnostics, OptionsPipeline}
import graft.sources.TickerSource

class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  test("raw-snapshot observe counts dropped rows in one pass") {
    val raw = Seq(
      ("C-ETH-100-171025", "call_options", "100", "105", "1.0", "5", 1L), // ok
      ("", "call_options", "100", "105", "1.0", "5", 2L), // missing symbol
      ("C-ETH-100-17OCT5", "call_options", "100", "105", "1.0", "5", 3L), // bad expiry
      ("C-ETH-x-171025", "call_options", "abc", "105", "1.0", "5", 4L) // bad strike
    ).toDF("symbol", "contract_type", "strike_price", "spot_price", "mark_price", "oi_contracts", "src_seq")
    val (observed, obs) = Diagnostics.observeRaw(raw)
    observed.count()
    val m = obs.get
    assert(m("rows_total") === 4L)
    assert(m("rows_missing_fields") === 1L)
    assert(m("rows_unparseable") === 2L)
  }

  test("delta observe reports new-vs-existing symbol counts (main.py:325-328)") {
    val cur = Seq(("A", 1.0, 10L), ("B", 2.0, 20L), ("C", 3.0, 30L))
      .toDF("SYMBOL", "Close", "OI")
    val st = Seq(("A", "0.5", "5", 1L), ("X", "9.9", "99", 2L))
      .toDF("SYMBOL", "Close", "OI", "state_seq")
    val (out, obs) = Delta.applyDeltaObserved(cur, Delta.prepareState(st, "state_seq"))
    out.count()
    val m = obs.get
    assert(m("n_existing") === 1L) // A
    assert(m("n_new") === 2L) // B, C
  }

  test("parsed-snapshot observe reports strike range and cardinalities") {
    val raw = TickerSource.syntheticFromLineitem(spark, "/root/testdata/sf0.001")
    val (observed, obs) = Diagnostics.observeSnapshot(OptionsPipeline.parseSnapshot(raw))
    observed.count()
    val m = obs.get
    assert(m("rows").asInstanceOf[Long] > 0)
    assert(m("min_strike").asInstanceOf[Double] <= m("max_strike").asInstanceOf[Double])
  }
}
