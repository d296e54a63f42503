package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.operators.Scd2.compressHistory]]: state-change
  * detection over an unbounded per-key event stream, emitting each CLOSED
  * validity interval the moment the key's state value changes — the CDC
  * ("change data capture") shape of the batch gaps-and-islands query (q33).
  *
  * Semantics contract, matched to the batch operator:
  *   - per key, events are folded in (ts, event_id) order (within a
  *     micro-batch the group iterator is sorted; across batches the
  *     per-key stream must be fed in order, the same arrival-order
  *     contract [[DeltaStream]] carries);
  *   - a closed interval (state, valid_from, valid_to = next run's first
  *     ts, n_events) is emitted exactly when a different state value
  *     arrives — identical rows to the batch operator's non-null-valid_to
  *     subset over the same prefix;
  *   - the key's OPEN run (batch q33's valid_to IS NULL row) lives in
  *     `GroupState` — bounded: one (state, from, n) triple per key,
  *     regardless of stream length. An optional processing-time TTL
  *     closes and evicts idle keys' open runs (flush-on-idle), emitting
  *     them with valid_to = -1 (unbounded marker) so state is finite
  *     under key churn.
  */
object IslandsStream {

  case class Ev(user_id: Long, state: String, ts_us: Long, event_id: Long)
  case class OpenRun(state: String, validFrom: Long, n: Long)
  case class Interval(user_id: Long, state: String, valid_from: Long, valid_to: Long, n_events: Long)

  implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
  implicit val runEnc: Encoder[OpenRun] = Encoders.product[OpenRun]
  implicit val outEnc: Encoder[Interval] = Encoders.product[Interval]
  implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

  private def foldOne(ttl: Option[String])(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[OpenRun]
  ): Iterator[Interval] = {
    if (state.hasTimedOut) {
      // idle past the TTL: flush the open run (valid_to = -1 = unbounded)
      // and evict — the bounded-state guarantee under key churn
      val out = state.getOption
        .map(r => Interval(userId, r.state, r.validFrom, -1L, r.n))
        .iterator
      state.remove()
      return out
    }
    val ordered = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    val out = Seq.newBuilder[Interval]
    var cur = state.getOption
    ordered.foreach { e =>
      cur match {
        case Some(r) if r.state == e.state =>
          cur = Some(r.copy(n = r.n + 1))
        case Some(r) =>
          out += Interval(userId, r.state, r.validFrom, e.ts_us, r.n)
          cur = Some(OpenRun(e.state, e.ts_us, 1L))
        case None =>
          cur = Some(OpenRun(e.state, e.ts_us, 1L))
      }
    }
    cur.foreach(state.update)
    ttl.foreach(state.setTimeoutDuration)
    out.result().iterator
  }

  /** Wire the stateful fold onto an event stream.
    *
    * @param stateTtl optional processing-time TTL after which an idle
    *                 key's open run is flushed (valid_to = -1) and evicted
    */
  def intervals(events: Dataset[Ev], stateTtl: Option[String] = None): Dataset[Interval] = {
    val timeout = stateTtl
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(foldOne(stateTtl) _)
  }
}
