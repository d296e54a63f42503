package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** External-service sink adapter — the missing half of the reference's
  * Google-Sheets append story (113rajababu113-wq/eth-options-data-pipeline
  * main.py:332-351 `append_to_sheets`: try, log, return False — no retry,
  * no replay protection). This adapter supplies the semantics a production
  * deployment needs around ANY external append API, while keeping the
  * actual transport behind a two-method interface.
  *
  * Delivery contract (the standard exactly-once-over-at-least-once
  * construction):
  *   1. **Batch-level idempotence**: Structured Streaming's `foreachBatch`
  *      re-delivers the last batch after a recovery. A driver-side commit
  *      ledger (one atomically-created marker file per batchId, the same
  *      shape as Spark's own streaming commit log) lets a replayed batch
  *      short-circuit to a no-op.
  *   2. **Partition-level idempotent keys**: the external write runs
  *      EXECUTOR-side via `foreachPartition` — the driver never
  *      materializes the batch — and every call carries
  *      (batchId, partitionId) so a task retried by Spark mid-batch can be
  *      deduplicated by the target (or by a staging layer in front of a
  *      target that can't dedup, e.g. stage-then-commit for Sheets).
  *   3. **Bounded retry with backoff** around each partition write:
  *      transient faults (HTTP 429/5xx analogs) are retried up to
  *      `maxRetries` with exponential backoff; a still-failing write
  *      rethrows so Spark fails the task — visible, not swallowed
  *      (the reference's `return False` silently drops the batch).
  *
  * At 100 TB this sink is only ever used for SMALL egress (alerts,
  * scoreboard rows, control-plane state — the Sheets analog); bulk egress
  * belongs in a real table sink. The per-partition fan-out still matters:
  * a driver-side `collect()+append_rows` loop caps throughput at one
  * connection and one heap.
  */
object ExternalSink {

  /** Transport interface. Implementations MUST be Serializable (they ship
    * to executors) and SHOULD honor the idempotence key: two calls with
    * the same (batchId, partitionId) may deliver the same rows twice.
    */
  trait PartitionWriter extends Serializable {

    /** Deliver one partition's rows. Throw [[TransientWriteFailure]] for
      * retryable faults; any other exception is treated as permanent.
      */
    def writePartition(batchId: Long, partitionId: Int, rows: Iterator[Row]): Unit
  }

  /** Retryable transport fault (rate limit, 5xx, timeout). */
  final class TransientWriteFailure(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  /** Driver-side batch commit ledger: `committed(id)` / `commit(id)` with
    * atomic marker-file creation, so concurrent re-runs cannot double-commit.
    */
  final class CommitLedger(dir: java.nio.file.Path) {
    java.nio.file.Files.createDirectories(dir)
    def committed(batchId: Long): Boolean =
      java.nio.file.Files.exists(dir.resolve(batchId.toString))
    def commit(batchId: Long): Unit =
      try java.nio.file.Files.createFile(dir.resolve(batchId.toString))
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }

  /** Append `df` (one micro-batch) to the external target. Returns true if
    * the batch was delivered by THIS call, false if the ledger showed it
    * already committed (foreachBatch replay). Use as
    * `stream.writeStream.foreachBatch((df, id) => ExternalSink.append(df, id, w, ledger))`.
    */
  def append(
      df: DataFrame,
      batchId: Long,
      writer: PartitionWriter,
      ledger: CommitLedger,
      maxRetries: Int = 3,
      backoffMs: Long = 100L
  ): Boolean = {
    if (ledger.committed(batchId)) return false
    df.rdd.foreachPartition { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      // buffer once so a retry re-delivers identical rows (the iterator is
      // single-shot); external-egress partitions are small by contract
      val buf = rows.toVector
      var attempt = 0
      var done = false
      while (!done) {
        try {
          writer.writePartition(batchId, pid, buf.iterator)
          done = true
        } catch {
          case e: TransientWriteFailure =>
            attempt += 1
            if (attempt > maxRetries)
              throw new RuntimeException(
                s"external write failed after $maxRetries retries (batch $batchId, partition $pid)", e)
            Thread.sleep(backoffMs * (1L << math.min(attempt - 1, 10)))
        }
      }
    }
    ledger.commit(batchId)
    true
  }
}
