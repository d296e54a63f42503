package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.operators.Robust.binnedQuantileDisc]]: a
  * per-key quantile maintained continuously over an unbounded value
  * stream — "p95 latency per endpoint, so far" — the sixth batch/stream
  * twin (delta, islands, distinct count, heavy hitters, sampling, now
  * quantiles).
  *
  * The binned histogram is what makes a streaming quantile possible with
  * bounded state at all: exact per-value buffers grow with the stream and
  * never stop, but a bin→count map is bounded by the OCCUPIED BIN count
  * (value domain >> binShift) regardless of stream length — the same
  * state bound the batch operator's exchange argument rests on, chosen by
  * the same binShift dial. Merging a micro-batch is elementwise count
  * addition (associative, order-free), so the stream's histogram after
  * ANY prefix equals the batch histogram of that prefix exactly.
  *
  * Emission contract: the BIN-resolution discrete quantile — the bin
  * whose cumulative count first exceeds `pNum·(n−1) div pDenom`, surfaced
  * as its lower bound `bin << binShift` plus (n_total, target_rank).
  * These equal the batch operator's target-bin table over the same
  * prefix (spec-pinned); at `binShift = 0` a bin IS a value and the
  * emission equals the batch operator's exact `q_value` itself. The
  * batch twin's second pass (exact element within the target bin) needs
  * the raw rows and is inherently batch — re-running it over the bin's
  * stored rows is the named escalation when exactness beyond bin
  * resolution is required at binShift > 0.
  *
  * Re-observing a value is NOT idempotent — a histogram counts
  * occurrences; that is the correct semantics for a quantile (unlike the
  * sampling twin's set membership). An optional processing-time TTL
  * evicts idle keys (forgets, no emission — a running quantile has no
  * "final" row).
  */
object QuantileStream {

  case class El(key: String, value: Long)
  case class HistState(bins: Array[Long], counts: Array[Long])
  case class Quant(key: String, n_total: Long, target_rank: Long, q_bin_lo: Long)

  implicit val elEnc: Encoder[El] = Encoders.product[El]
  implicit val stEnc: Encoder[HistState] = Encoders.product[HistState]
  implicit val outEnc: Encoder[Quant] = Encoders.product[Quant]
  implicit val keyEnc: Encoder[String] = Encoders.STRING

  private def fold(pNum: Long, pDenom: Long, binShift: Int, ttl: Option[String])(
      key: String,
      els: Iterator[El],
      state: GroupState[HistState]
  ): Iterator[Quant] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val hist = mutable.TreeMap.empty[Long, Long]
    state.getOption.foreach { s =>
      var i = 0
      while (i < s.bins.length) { hist.put(s.bins(i), s.counts(i)); i += 1 }
    }
    els.foreach { e =>
      val b = e.value >> binShift
      hist.put(b, hist.getOrElse(b, 0L) + 1L)
    }
    val bins = hist.keys.toArray
    val counts = bins.map(hist)
    state.update(HistState(bins, counts))
    ttl.foreach(state.setTimeoutDuration)
    val n = counts.sum
    if (n == 0L) Iterator.empty
    else {
      val target = pNum * (n - 1) / pDenom
      var cum = 0L
      var i = 0
      while (cum + counts(i) <= target) { cum += counts(i); i += 1 }
      Iterator.single(Quant(key, n, target, bins(i) << binShift))
    }
  }

  /** Wire the histogram fold onto a keyed value stream. `pNum/pDenom` is
    * the quantile (e.g. 95/100), `binShift` the bin width dial (0 =
    * exact-value bins).
    */
  def quantiles(
      elems: Dataset[El],
      pNum: Long,
      pDenom: Long,
      binShift: Int,
      stateTtl: Option[String] = None
  ): Dataset[Quant] = {
    require(pNum >= 0 && pDenom > 0 && pNum <= pDenom, s"p must be in [0,1]: $pNum/$pDenom")
    require(binShift >= 0 && binShift < 64, s"binShift must be in [0,64): $binShift")
    val timeout = stateTtl
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    elems
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(), timeout)(
        fold(pNum, pDenom, binShift, stateTtl) _)
  }
}
