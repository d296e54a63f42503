package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Scale: the sink is PARTITIONED BY batch_id, so the tail-N read prunes to
  * the newest partition(s) — O(tail) I/O per batch instead of O(history):
  * an unpartitioned sink re-scans its entire accumulated life to keep 300
  * rows, which at 100× sink age is the dominant cost of every micro-batch.
  * Partition selection walks batch directories newest-first, accumulating
  * footer-metadata row counts until ≥ n, then takes the tail via
  * orderBy(desc).limit(n) — a TakeOrderedAndProject over only the selected
  * partitions, never a global window over history.
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
      .withColumn("batch_id", lit(batchId))
      .write
      .mode("append")
      .partitionBy("batch_id")
      .parquet(path)
  }

  /** Last `n` appended rows (reference tail(300), main.py:260), renamed
    * `state_seq` for Delta.prepareState.
    *
    * Partition-pruned: only the newest batch_id directories whose
    * cumulative row counts reach `n` are read (counts are parquet footer
    * metadata — no data pages touched), and the tail over that bounded
    * slice is orderBy(sink_seq desc).limit(n), which plans as
    * TakeOrderedAndProject (per-partition top-N, one bounded merge) — no
    * global single-partition window, no full-history scan. Driver state
    * is one (batch_id, count) pair per selected partition, bounded by
    * ceil(n / min-batch-rows) non-empty batches. A pre-partitioning
    * legacy sink (no batch_id= directories) falls back to the full scan
    * with the same tail semantics.
    */
  def readStateTail(spark: SparkSession, path: String, n: Int = 300): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDirs = fs
      .listStatus(hPath)
      .toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
      .flatMap(st =>
        st.getPath.getName.stripPrefix("batch_id=").toLongOption.map(_ -> st.getPath))
      .sortBy { case (id, _) => -id }
    val slice =
      if (batchDirs.isEmpty) spark.read.parquet(path) // legacy unpartitioned sink
      else {
        val picked = scala.collection.mutable.ArrayBuffer.empty[String]
        var acc = 0L
        val it = batchDirs.iterator
        while (acc < n && it.hasNext) {
          val dir = it.next()._2.toString
          picked += dir
          acc += spark.read.parquet(dir).count() // footer metadata only
        }
        spark.read
          .option("basePath", path)
          .parquet(picked.toSeq: _*)
          .drop("batch_id")
      }
    slice
      .orderBy(col("sink_seq").desc)
      .limit(n)
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
