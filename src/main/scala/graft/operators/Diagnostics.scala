package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Observable run counters (SURVEY.md §2.3 diagnostics): the reference logs
  * parse success/failure counts (main.py:153-155,225), strike-filter drop
  * counts (main.py:226) and min/max/expiry summaries (main.py:241-243).
  * Spark's `observe` attaches these as accumulator-backed metrics evaluated
  * during the SAME pass as the query — no second scan, no collect.
  */
object Diagnostics {

  /** Attach reference-equivalent snapshot counters; read them from the
    * returned Observation after the next action on the DataFrame.
    */
  def observeSnapshot(parsed: DataFrame): (DataFrame, Observation) = {
    val obs = Observation("graft_snapshot")
    val observed = parsed.observe(
      obs,
      count(lit(1)).as("rows"),
      min(col("Strike")).as("min_strike"),
      max(col("Strike")).as("max_strike"),
      approx_count_distinct(col("expiry")).as("n_expiries"),
      approx_count_distinct(col("SYMBOL")).as("n_symbols")
    )
    (observed, obs)
  }

  /** Parse-failure counter over the raw snapshot (rows the pipeline will
    * drop): mirrors failed_parsing/skipped counts at main.py:225-226.
    */
  def observeRaw(raw: DataFrame): (DataFrame, Observation) = {
    val obs = Observation("graft_raw")
    val mandatoryOk = Parse.mandatoryPresent(raw)
    val parseOk = Parse.expiryFromSymbol(col("symbol")).isNotNull &&
      Parse.tryDouble(col("strike_price")).isNotNull
    val observed = raw.observe(
      obs,
      count(lit(1)).as("rows_total"),
      count(when(!mandatoryOk, 1)).as("rows_missing_fields"),
      count(when(mandatoryOk && !parseOk, 1)).as("rows_unparseable")
    )
    (observed, obs)
  }
}
