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
    */
  def append(df: DataFrame, path: String, batchId: Long): Unit = {
    val w = Window.orderBy(
      col("Expiry_Date").asc,
      col("Time").asc,
      col("SYMBOL").asc
    )
    df.withColumn("sink_seq", lit(batchId) * lit(1L << 32) + row_number().over(w))
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
