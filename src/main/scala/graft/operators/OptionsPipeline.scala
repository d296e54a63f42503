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

  /** Parse the raw ticker snapshot into the typed pre-join shape
    * (SURVEY.md §2.2): mandatory-field drop, strict numeric parsing
    * (reference `float()`/`int()` throw → row dropped, main.py:168-169,
    * 197-198,220-223 — absent mark/oi default to 0), per-row spot, symbol →
    * expiry, option-type CASE. Filter order differs from the reference's
    * sequential `continue`s but all predicates are conjunctive, so the
    * surviving set is identical.
    */
  def parseSnapshot(raw: DataFrame): DataFrame =
    raw
      .where(Parse.mandatoryPresent(raw))
      .withColumn("Strike", Parse.tryDouble(col("strike_price")))
      .withColumn("spot", Parse.tryDouble(col("spot_price")))
      .withColumn("expiry", Parse.expiryFromSymbol(col("symbol")))
      .withColumn("Close", Parse.markPriceOrDrop(col("mark_price")))
      .withColumn("OI", Parse.oiContractsOrDrop(col("oi_contracts")))
      .where(
        col("Strike").isNotNull && col("spot").isNotNull &&
          col("expiry").isNotNull && col("Close").isNotNull && col("OI").isNotNull
      )
      .select(
        col("symbol").as("SYMBOL"),
        col("expiry"),
        col("Strike"),
        col("spot"),
        Parse.optionType(col("contract_type")).as("Option_Type"),
        col("Close"),
        col("OI"),
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
    // Two structural choices for the batch plan:
    //   - spread: byte-sized scan splits (single-row-group parquet → a
    //     single-task scan) serialize the CPU-heavy parse; repartition to
    //     cluster parallelism first (SURVEY.md §8.3 lesson).
    //   - persist: the snapshot feeds the policy pre-pass, the main pass,
    //     AND the final sort's range-partition sampler — caching it means
    //     the source is read once per batch instead of three times. Safe
    //     ONLY because the parse predicates that the optimizer pushes into
    //     the cache-scan stage are regex-free (see Parse.expiryToken):
    //     expressions above an InMemoryTableScan run outside whole-stage
    //     codegen, and an interpreted `split`/`rlike` recompiles its
    //     Pattern per row (measured 600+ CPU-seconds at sf0.1 before the
    //     regex-free rewrite). Cached blocks spill to disk and are dropped
    //     by the ContextCleaner once the plan is unreferenced.
    val raw = Dedup.spread(rawTickers)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val parsed = parseSnapshot(raw)

    // Expiry-policy pre-pass (reference pass 1, main.py:128-141): the ONLY
    // driver-side decision input is the distinct parsed expiry set, bounded
    // by the listing calendar (dozens of dates at any data scale). The
    // aggregate references only `symbol`, so column pruning reduces this
    // scan to a single column; the main pass below is the sole full-width
    // scan of the source. Like the reference's pass 1, rows missing other
    // mandatory fields still contribute their expiry here.
    val expiryDf = raw.select(Parse.expiryFromSymbol(col("symbol")).as("expiry"))
    val (targets, bandPct) = policy match {
      case Hourly => (ExpiryPolicy.nearestExpiries(expiryDf, today), 7.0)
      case Weekly => (ExpiryPolicy.fridayExpiries(expiryDf, today), 25.0)
    }

    // Per-row spot (reference main.py:168-172,204): each ticker is banded
    // against ITS OWN spot_price and emits that value as Future_Price. The
    // batch-global first-arrival spot (main.py:112-116, Parse.firstSpot) is
    // only ever logged by the reference — never used for filtering.
    val banded = parsed
      .where(Snapshot.strikeBand(col("Strike"), col("spot"), bandPct))
      .where(Snapshot.expiryIn(col("expiry"), targets))

    val deduped = Snapshot.keepLast(banded, Seq("SYMBOL"), "src_seq")

    val stamped = deduped
      .withColumn("Date", date_format(lit(java.sql.Date.valueOf(batchDate)), "yyyy-MM-dd"))
      .withColumn(
        "Time",
        lit(batchTime.format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss")))
      )
      .withColumn("Future_Price", col("spot"))
      .withColumn("Expiry_Date", date_format(col("expiry"), "yyyy-MM-dd"))

    val withDelta = Delta.applyDelta(stamped, Delta.prepareState(state, "state_seq"))

    val cleaned = Seq("Future_Price", "Strike", "Close", "Open")
      .foldLeft(withDelta)((df, c) => df.withColumn(c, Snapshot.cleanNumeric(col(c))))

    Snapshot.canonicalSort(cleaned.select(Schemas.sinkColumns.map(col): _*))
  }
}
