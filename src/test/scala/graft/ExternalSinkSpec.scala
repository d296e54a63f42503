package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Row
import graft.sinks.ExternalSink

/** Delivery semantics of the external-service sink adapter: replay
  * short-circuit, transient-retry, permanent escalation, and executor-side
  * idempotence keys.
  */
class ExternalSinkSpec extends SparkSpec {
  import spark.implicits._

  // static so executor-side tasks (local JVM) and the spec share state
  import ExternalSinkSpec._

  private def freshLedger() =
    new ExternalSink.CommitLedger(
      java.nio.file.Files.createTempDirectory("graft-ledger"))

  test("delivers every row exactly once across partitions; replay is a no-op") {
    sunk.clear(); calls.set(0); transientLeft.set(0)
    val ledger = freshLedger()
    val df = (1 to 100).toDF("v").repartition(8)
    assert(ExternalSink.append(df, batchId = 7L, new RecordingWriter, ledger))
    assert(sunk.keySet().size === 100)
    val callsAfterFirst = calls.get()
    // foreachBatch replay of the same batch: ledger short-circuits
    assert(!ExternalSink.append(df, batchId = 7L, new RecordingWriter, ledger))
    assert(calls.get() === callsAfterFirst, "replayed batch must not touch the transport")
  }

  test("transient failures are retried with identical rows, then succeed") {
    sunk.clear(); calls.set(0); transientLeft.set(2)
    val ledger = freshLedger()
    val df = (1 to 50).toDF("v").repartition(1)
    assert(ExternalSink.append(df, 1L, new RecordingWriter, ledger,
      maxRetries = 3, backoffMs = 1L))
    assert(sunk.keySet().size === 50)
    // 2 failed attempts + 1 success; the idempotence key deduped re-delivery
    assert(calls.get() === 3)
  }

  test("permanent failure escalates (task fails, batch not committed)") {
    sunk.clear(); calls.set(0); transientLeft.set(Int.MaxValue)
    val ledger = freshLedger()
    val df = (1 to 10).toDF("v").repartition(1)
    intercept[Exception] {
      ExternalSink.append(df, 2L, new RecordingWriter, ledger,
        maxRetries = 2, backoffMs = 1L)
    }
    assert(!ledger.committed(2L), "a failed batch must stay uncommitted for redelivery")
  }
}

object ExternalSinkSpec {
  val sunk = new ConcurrentHashMap[Int, String]()
  val calls = new AtomicInteger(0)
  val transientLeft = new AtomicInteger(0)

  /** Test transport: records (row → idempotence key), throwing a transient
    * fault while the shared `transientLeft` budget lasts. Re-delivered
    * (batchId, partitionId) rows overwrite, modeling an idempotent target.
    */
  final class RecordingWriter extends ExternalSink.PartitionWriter {
    override def writePartition(batchId: Long, partitionId: Int, rows: Iterator[Row]): Unit = {
      calls.incrementAndGet()
      if (transientLeft.get() > 0 && transientLeft.getAndDecrement() > 0)
        throw new ExternalSink.TransientWriteFailure(s"simulated 429 (batch $batchId)")
      rows.foreach(r => sunk.put(r.getInt(0), s"$batchId/$partitionId"))
    }
  }
}
