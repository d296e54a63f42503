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

/** Shared table readers and cross-family SQL fragments for the query
  * registry traits (the SparkEntry split, r13 verdict #7): one linear
  * trait chain Base -> Options -> CoreText -> CurationIndex ->
  * MediaGraph -> Retrieval -> Learned, mixed into [[SparkEntry]], so
  * every family file stays under ~2.5k lines while the aggregated
  * query/oracle maps stay entry-identical.
  */
private[graft] trait SparkEntryBase {
  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The documents scan spread to cluster parallelism — for surfaces whose
    * CPU cost is map-side expression work over the text (tokenize /
    * n-gram / codec-decode fold expressions). The local testdata table is
    * ONE sub-row-group-size parquet file, so without this every such
    * surface runs its hot loop in a single scan task (wall ≈ cpu on a
    * 32-core host — the x34/x74 partition-inheritance lesson, and the
    * amplifier behind the round-6 driver-environment bench inflation:
    * a JIT-starved interpreted loop hurts 32× more when it cannot
    * parallelize). This belongs in the QUERY BUILDERS, not the operators:
    * a 100 TB scan has thousands of natural splits and a forced text
    * repartition there would be a pure shuffle tax, while map-only
    * operators (text stats, PII scrub, rule flags) must stay map-only.
    */
  protected def dts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's reader rejects;
    * read the physical INT64 as epoch-nanos (`ts_ns`) via an explicit
    * schema. Keeping nanos as long also preserves the full arrival order —
    * truncating to micros would merge 99.9% of events into ties.
    */
  protected def ev(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // Two on-disk generations of events.parquet exist: TIMESTAMP(NANOS)
    // (Spark rejects the logical type at schema inference, so it can only
    // be read as raw LONG nanos) and TIMESTAMP(MICROS/NTZ) (Spark infers a
    // timestamp type). Either way the physical column is a raw int64, so
    // force a LONG read — timezone-free — and use the footer probe only to
    // decide the SCALE. Forcing LONG while assuming nanos on the MICROS
    // generation silently mis-scales every derived time by 1000×.
    val rawIsMicros = scala.util
      .Try(s.read.parquet(path).schema("ts").dataType)
      .toOption
      .exists(t => t == TimestampType || t == TimestampNTZType)
    val base = s.read
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(path)
    val withTimes =
      if (rawIsMicros)
        base
          .withColumnRenamed("ts", "ts_us")
          .withColumn("ts_ns", col("ts_us") * lit(1000L))
      else
        base
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000"))
    withTimes.select(col("event_id"), col("ts_ns"), col("user_id"),
      col("event_type"), col("value"), col("props"), col("ts_us"))
  }

  protected def tsNsDate(c: Column): Column =
    to_date(timestamp_micros((c / 1000).cast(LongType)))

  /** Materialized global sort — for surfaces whose final orderBy sits on
    * an expensive UNMATERIALIZED subtree (map-only decode/projection
    * chains, broadcast-join probes): a bare `orderBy` plans a range
    * exchange whose boundary-SAMPLING job re-executes the entire child
    * subtree, so the query pays its map-side compute TWICE (measured:
    * x11's 4M-pair crossJoin ran as two full 32-task stages under its
    * tail sort — guide §1.1's pass count, violated by the planner).
    * The round-robin repartition inserts a real shuffle boundary: the
    * child runs ONCE into shuffle files and both the sampler and the
    * sort read those. Cost: one extra RESULT-sized shuffle — the right
    * trade exactly when the child's compute exceeds a pass over the
    * result rows, which is the selection criterion for call sites
    * (queries whose sort child is an aggregation/window exchange keep
    * the bare orderBy: their sampler already reads shuffle files).
    * Tie ROWS may land in different relative order than a bare orderBy
    * (round-robin reassigns rows between equal keys); the driver's
    * oracle compare is whole-row-sorted, so the certified result is
    * identical.
    */
  protected def msort(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .orderBy(cols: _*)

  /** Postfix spelling of [[msort]], so a query tail converts with a
    * one-token diff: `.orderBy(...)` → `.msorted(...)`.
    */
  protected implicit class MSortOps(df: DataFrame) {
    def msorted(cols: Column*): DataFrame = msort(df, cols: _*)
  }

  /** DuckDB-side hex→integer for x57's 10-char md5 prefix, generated from
    * the SAME positional loop as [[graft.operators.DistinctSketch.hash40]]
    * decodes (most-significant digit first) so the two sides cannot drift.
    * `h` is the 10-char lowercase hex string in scope at the splice point.
    */
  protected val kmvHexToIntSql: String =
    (1 to DistinctSketch.HexChars)
      .map(i =>
        s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * " +
          s"${1L << (4 * (DistinctSketch.HexChars - i))}")
      .mkString(" + ")

}
