package graft.operators

import java.time.{LocalDate, LocalTime}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Schemas

/** End-to-end batch of the options pipeline: the Spark-native re-expression
  * of reference `fetch_eth_options_data` + `calculate_open_and_oi_change`
  * (main.py:91-330; weekly variant deltaweekly.py). One declarative plan:
  * parse → band filter → expiry filter → keep-last dedup → broadcast delta
  * join → canonical sort.
  *
  * The batch timestamp is injected (run-constant, SURVEY.md §7.4) rather
  * than taken from the clock: the reference stamps one wall-clock value per
  * run (main.py:126), and injection keeps tests/oracles deterministic.
  */
object OptionsPipeline {

  sealed trait Policy
  /** Hourly: E0/E1/E2 nearest expiries, ±7% band (main.py). */
  case object Hourly extends Policy
  /** Weekly: W1/W2 Friday expiries, ±25% band (deltaweekly.py). */
  case object Weekly extends Policy

  /** Parse the raw ticker snapshot into the typed 9-column pre-join shape
    * (SURVEY.md §2.2): mandatory-field drop, numeric coercion, symbol →
    * expiry, option-type CASE.
    */
  def parseSnapshot(raw: DataFrame): DataFrame =
    raw
      .where(Parse.mandatoryPresent(raw))
      .withColumn("Strike", Parse.tryDouble(col("strike_price")))
      .withColumn("expiry", Parse.expiryFromSymbol(col("symbol")))
      .where(col("Strike").isNotNull && col("expiry").isNotNull)
      .select(
        col("symbol").as("SYMBOL"),
        col("expiry"),
        col("Strike"),
        Parse.optionType(col("contract_type")).as("Option_Type"),
        Parse.tryDoubleOrZero(col("mark_price")).as("Close"),
        Parse.tryLongOrZero(col("oi_contracts")).as("OI"),
        col("src_seq")
      )

  /** One scheduled run (reference main(), main.py:353-396).
    *
    * @param rawTickers raw snapshot (Schemas.ticker shape, with src_seq)
    * @param state      previous sink rows (tail-N read-back; may be empty)
    * @param today      "today" for expiry policy (reference uses IST now)
    * @param batchDate  run-constant Date stamp (yyyy-MM-dd)
    * @param batchTime  run-constant Time stamp (HH:mm:ss)
    */
  def runBatch(
      rawTickers: DataFrame,
      state: DataFrame,
      policy: Policy,
      today: LocalDate,
      batchDate: LocalDate,
      batchTime: LocalTime
  ): DataFrame = {
    val parsed = parseSnapshot(rawTickers)

    // Batch stats in ONE pass over the raw snapshot: first-in-arrival-order
    // spot (reference main.py:112-116 — raw rows count even if their symbol
    // later fails to parse) and the distinct parsed expiry set (bounded by
    // the listing calendar). min_by skips rows whose ordering expr is NULL,
    // collect_set skips NULL expiries.
    val spotCol = Parse.tryDouble(col("spot_price"))
    val stats = rawTickers
      .agg(
        min_by(spotCol, when(spotCol.isNotNull, col("src_seq"))).as("spot"),
        collect_set(Parse.expiryFromSymbol(col("symbol"))).as("expiries")
      )
      .collect()(0)
    val spot = if (stats.isNullAt(0)) 0.0 else stats.getDouble(0)
    val expiryDates = stats.getSeq[java.sql.Date](1).map(_.toLocalDate)

    val (targets, bandPct) = policy match {
      case Hourly => (ExpiryPolicy.nearestFromDates(expiryDates, today), 7.0)
      case Weekly => (ExpiryPolicy.fridayFromDates(expiryDates, today), 25.0)
    }

    val banded = parsed
      .where(Snapshot.strikeBand(col("Strike"), lit(spot), bandPct))
      .where(Snapshot.expiryIn(col("expiry"), targets))

    val deduped = Snapshot.keepLast(banded, Seq("SYMBOL"), "src_seq")

    val stamped = deduped
      .withColumn("Date", date_format(lit(java.sql.Date.valueOf(batchDate)), "yyyy-MM-dd"))
      .withColumn(
        "Time",
        lit(batchTime.format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss")))
      )
      .withColumn("Future_Price", lit(spot))
      .withColumn("Expiry_Date", date_format(col("expiry"), "yyyy-MM-dd"))

    val withDelta = Delta.applyDelta(stamped, Delta.prepareState(state, "state_seq"))

    val cleaned = Seq("Future_Price", "Strike", "Close", "Open")
      .foldLeft(withDelta)((df, c) => df.withColumn(c, Snapshot.cleanNumeric(col(c))))

    Snapshot.canonicalSort(cleaned.select(Schemas.sinkColumns.map(col): _*))
  }
}
