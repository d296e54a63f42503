package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Schemas

/** Ticker snapshot sources (SURVEY.md §2.1).
  *
  * The reference fetches `GET /v2/tickers` driver-side (main.py:94-104).
  * Here the engine-facing contract is "a DataFrame in Schemas.ticker shape";
  * adapters produce it:
  *   - [[fromJson]]: JSON-lines fixture/capture files (tests, replay);
  *   - [[syntheticFromLineitem]]: a deterministic snapshot derived from the
  *     driver's testdata, used by SparkEntry.entry so the flagship exercises
  *     the full pipeline without network I/O (zero-egress environment).
  *
  * A production REST adapter would be a DataSource V2 TableProvider doing the
  * HTTP fetch in `PartitionReader`s; the pipeline code would not change.
  */
object TickerSource {

  /** Read a JSON-lines ticker capture with the explicit source schema
    * (never inference in production paths, SURVEY.md §1.4).
    */
  def fromJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.ticker).json(path)

  /** STREAMING ticker feed from a file-drop directory: each JSON-lines
    * capture dropped into `dir` becomes (part of) a micro-batch — the
    * natural replay/production feed for
    * [[graft.streaming.PipelineStream]], where the reference polls the
    * REST endpoint once per cron tick (main.py:94-104) and an operator
    * drops one capture file per tick here. Explicit schema, explicit
    * `maxFilesPerTrigger=1` default so one capture ≙ one reference run.
    */
  def streamFromJsonDir(
      spark: SparkSession,
      dir: String,
      maxFilesPerTrigger: Int = 1
  ): DataFrame =
    spark.readStream
      .schema(Schemas.ticker)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Weekly-policy variant of [[syntheticFromLineitem]]: expiries are spread
    * across ALL weekdays — `date_trunc(week) + (l_orderkey mod 7) days` — so
    * the Friday-only W1/W2 selection (deltaweekly.py:43-111) has both
    * Fridays to pick and non-Friday actives to count. Spot stays 30000; the
    * weekly ±25% band applies downstream.
    */
  def syntheticWeeklyFromLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    // repartition BEFORE the symbol build: the parquet read is 3 byte-sized
    // splits, and string construction over 600k rows on 3 cores costs ~10 s
    // (column pruning pushes through the exchange, so only the 5 used
    // columns shuffle)
    val li = spark.read
      .parquet(s"$sfDir/lineitem.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val expiry = date_add(trunc(col("l_shipdate"), "week"), (col("l_orderkey") % 7).cast("int"))
    // strikes folded into [15000, 45000) so the ±25% band of spot 30000
    // keeps ~half the chain — enough in-band rows per expiry for a dense
    // W1/W2 output at every SF
    val strike = floor(col("l_extendedprice")) % 30000 + 15000
    li.select(
      concat(
        when(col("l_linenumber") % 2 === 0, lit("C")).otherwise(lit("P")),
        lit("-ETH-"),
        strike.cast("string"),
        lit("-"),
        date_format(expiry, "ddMMyy")
      ).as("symbol"),
      when(col("l_linenumber") % 2 === 0, lit("call_options"))
        .otherwise(lit("put_options"))
        .as("contract_type"),
      strike.cast("string").as("strike_price"),
      lit("30000").as("spot_price"),
      round(col("l_extendedprice") * lit(0.001), 2).cast("string").as("mark_price"),
      col("l_quantity").cast("long").cast("string").as("oi_contracts"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("src_seq")
    )
  }

  /** Deterministic synthetic option-chain snapshot from `lineitem`:
    *   symbol  = {C|P}-ETH-<strike>-<DDMMYY of month(l_shipdate)>
    *   strike  = floor(l_extendedprice)
    *   spot    = 30000 (fixed), call/put from l_linenumber parity.
    * Expiries are month-truncated so each expiry carries many contracts
    * (a real chain has few expiries × many strikes, not the reverse).
    * Stringly-typed like the wire format, with src_seq arrival order.
    */
  def syntheticFromLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    // see syntheticWeeklyFromLineitem: parallelize before the string build
    val li = spark.read
      .parquet(s"$sfDir/lineitem.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    li.select(
      concat(
        when(col("l_linenumber") % 2 === 0, lit("C")).otherwise(lit("P")),
        lit("-ETH-"),
        floor(col("l_extendedprice")).cast("string"),
        lit("-"),
        date_format(trunc(col("l_shipdate"), "month"), "ddMMyy")
      ).as("symbol"),
      when(col("l_linenumber") % 2 === 0, lit("call_options"))
        .otherwise(lit("put_options"))
        .as("contract_type"),
      floor(col("l_extendedprice")).cast("string").as("strike_price"),
      lit("30000").as("spot_price"),
      round(col("l_extendedprice") * lit(0.001), 2).cast("string").as("mark_price"),
      col("l_quantity").cast("long").cast("string").as("oi_contracts"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("src_seq")
    )
  }
}
