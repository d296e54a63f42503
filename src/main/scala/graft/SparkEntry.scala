package graft

import java.time.{LocalDate, LocalTime}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions
import graft.operators._
import graft.sinks.ParquetSink
import graft.sources.TickerSource

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * Every operator family from SURVEY.md §2 (and the north-star extension
  * operators) appears here as a named query over the driver-generated
  * parquet tables, with an ANSI-SQL twin in [[oracleSql]] for the DuckDB
  * hash-compare where the operator is SQL-expressible.
  *
  * Conventions shared by query and oracle (required for hash equality):
  *   - identical output column NAMES and a total-order ORDER BY;
  *   - floating aggregates rounded identically on both sides (sums to 2 dp,
  *     ratios to 4 dp, similarities to 6 dp) — raw column passthroughs are
  *     left unrounded (bit-identical out of the same parquet);
  *   - all casts are `try_*` so queries behave the same under ANSI (the
  *     driver's session) and non-ANSI (GraftSession) modes.
  */
object SparkEntry extends LearnedRegistry {

  /** Flagship: the full options-pipeline batch (parse → band → expiry policy
    * → dedup → delta join → canonical sort) on a deterministic synthetic
    * ticker snapshot derived from sf0.001 lineitem, against empty state.
    */
  def entry(spark: SparkSession): DataFrame = {
    val raw = TickerSource.syntheticFromLineitem(spark, "/root/testdata/sf0.001")
    OptionsPipeline.runBatch(
      raw,
      ParquetSink.emptyState(spark),
      OptionsPipeline.Hourly,
      today = LocalDate.of(2000, 1, 1),
      batchDate = LocalDate.of(2000, 1, 1),
      batchTime = LocalTime.of(12, 0, 0)
    )
  }

  // ---------------------------------------------------------------- parity

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    optionsQueries ++ coreQueries ++ curixQueries ++ mediaQueries ++
      retrQueries ++ learnedQueries

  private lazy val baseOracleSql: Map[String, String] =
    optionsOracles ++ coreOracles ++ curixOracles ++ mediaOracles ++
      retrOracles ++ learnedOracles

  /** x124 classifies the same delivery against the same frozen index as
    * x75, re-opened from the BUCKETED on-disk artifact — identical
    * classification semantics by the [[graft.operators.Dedup
    * .loadNearDupIndexBucketed]] contract, so the oracle is x75's
    * verbatim: one definition, two surfaces, and the artifact round-trip
    * (build → bucketed write → table read → classify) is hash-certified
    * end to end instead of only spec-pinned.
    */
  def oracleSql: Map[String, String] =
    baseOracleSql +
      ("x124_indexed_ingest_bucketed" -> baseOracleSql("x75_indexed_ingest"))

}
