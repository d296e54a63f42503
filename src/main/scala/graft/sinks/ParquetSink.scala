package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet sink + bounded state read-back (SURVEY.md §2.1).
  *
  * Replaces the reference's Google-Sheets append (main.py:332-351) and
  * `get_all_records().tail(300)` state read (main.py:252-264). The sheet was
  * both sink and state store; here the sink is append-mode parquet and the
  * state read is the last-N rows by an explicit `sink_seq` ordering column —
  * pandas `tail` order becomes explicit, shuffle-deterministic ordering
  * (SURVEY.md §7.4).
  *
  * Scale: the tail-N read sorts only (sink_seq) pairs — a top-N, not a full
  * sort — and N is 300, so the driver-side materialization is bounded.
  * A real deployment would partition the sink by date and prune to the last
  * partition before the top-N.
  */
object ParquetSink {

  /** Append a batch, stamping a monotone per-batch sequence so read-back can
    * reconstruct append order across files: sink_seq = batchId * 2^32 + row
    * position within the batch's canonical order.
    *
    * Scale: a partition-less `row_number` window would funnel the whole
    * batch through ONE task. Instead the batch is canonically sorted (a
    * range-partitioned exchange that keeps all tasks busy) and then numbered
    * with `zipWithIndex`, which assigns globally consecutive indices from
    * per-partition counts — one tiny O(#partitions) driver round-trip, no
    * single-task stage, order identical to the sorted DataFrame's.
    */
  def append(df: DataFrame, path: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val sorted = df.orderBy(col("Expiry_Date").asc, col("Time").asc, col("SYMBOL").asc)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("sink_seq", org.apache.spark.sql.types.LongType)
    )
    val base = batchId * (1L << 32)
    val rows = sorted.rdd
      .zipWithIndex()
      .map { case (r, i) => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (base + i + 1L)) }
    spark
      .createDataFrame(rows, schema)
      .write
      .mode("append")
      .parquet(path)
  }

  /** Last `n` appended rows (reference tail(300), main.py:260), renamed
    * `state_seq` for Delta.prepareState.
    */
  def readStateTail(spark: SparkSession, path: String, n: Int = 300): DataFrame = {
    val w = Window.orderBy(col("sink_seq").desc)
    spark.read
      .parquet(path)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
      .withColumnRenamed("sink_seq", "state_seq")
  }

  /** Empty state for the first run (reference main.py:269-273). */
  def emptyState(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(
        Seq(
          StructField("SYMBOL", StringType),
          StructField("Close", StringType),
          StructField("OI", StringType),
          StructField("state_seq", LongType)
        )
      )
    )
  }
}
