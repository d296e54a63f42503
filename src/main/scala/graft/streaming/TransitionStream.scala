package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.operators.Sessionize.transitionCounts]]'s
  * transition EXTRACTION — the seventh batch/stream twin (after delta,
  * islands, distinct count, heavy hitters, weighted sample, quantile):
  * per key, emit one (prev_state, next_state) row the moment each
  * transition completes, carrying only the key's LAST event as state.
  *
  * Works because a first-order transition is a function of two adjacent
  * events only: "k smallest", "open run", "last row" — all the twins
  * exploit the same bounded sufficient statistic, here one (ts, tieBreak,
  * state) triple per key, regardless of stream length.
  *
  * Semantics contract, matched to the batch operator:
  *   - per key, events fold in (ts_us, event_id) order (micro-batch
  *     groups are sorted; across batches the per-key stream must arrive
  *     in order — the [[DeltaStream]]/[[IslandsStream]] contract);
  *   - the emitted transition rows over any prefix are EXACTLY the rows
  *     the batch lag-window extracts from that prefix, so downstream
  *     `groupBy(prev,next).count()` (a plain streaming aggregation)
  *     reproduces the batch matrix; the ppm normalization stays
  *     downstream-side where the totals are (it needs the whole matrix,
  *     not per-event state);
  *   - optional TTL evicts idle keys (a lone last-event carries no
  *     pending output, so eviction emits nothing and loses nothing
  *     except the chain continuation of a key that returns later —
  *     disclosed, the standard churn trade).
  */
object TransitionStream {

  case class Ev(user_id: Long, state: String, ts_us: Long, event_id: Long)
  case class LastEv(ts_us: Long, event_id: Long, state: String)
  case class Transition(user_id: Long, prev_state: String, next_state: String, ts_us: Long)

  implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
  implicit val lastEnc: Encoder[LastEv] = Encoders.product[LastEv]
  implicit val outEnc: Encoder[Transition] = Encoders.product[Transition]
  implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

  private def foldOne(ttl: Option[String])(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[LastEv]
  ): Iterator[Transition] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val ordered = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    val out = Seq.newBuilder[Transition]
    var cur = state.getOption
    ordered.foreach { e =>
      cur.foreach(p => out += Transition(userId, p.state, e.state, e.ts_us))
      cur = Some(LastEv(e.ts_us, e.event_id, e.state))
    }
    cur.foreach(state.update)
    ttl.foreach(state.setTimeoutDuration)
    out.result().iterator
  }

  /** Wire the transition extraction onto a keyed event stream. */
  def transitions(events: Dataset[Ev], stateTtl: Option[String] = None): Dataset[Transition] = {
    val timeout = stateTtl
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(foldOne(stateTtl) _)
  }
}
