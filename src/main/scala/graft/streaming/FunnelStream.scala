package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.operators.Sessionize.funnelStages]] — the
  * eighth batch/stream twin: per key, track live how far through the
  * ordered step list the stream has converted, emitting the key's CURRENT
  * funnel row whenever a micro-batch advances (or first observes) it.
  *
  * Works because the funnel's sufficient statistic is tiny and monotone:
  * (events seen so far, steps completed, the position of each completed
  * step). A new event either increments the row counter only, or — when
  * it matches the NEXT awaited step — also advances the stage. Nothing
  * else about history matters, so state is one small struct per key
  * regardless of stream length, and the emitted row after any prefix
  * EQUALS the batch operator's row for that prefix (spec-pinned),
  * including the strict after-previous-step semantics (positions are
  * plain arrival indexes in the same (ts, tieBreak) order).
  *
  * Contract notes, matching the other twins: within a micro-batch the
  * group's events fold in (ts, tieBreak) order; across batches the
  * per-key stream must arrive in order. Emission (Update-mode shape): the
  * key's full current row — a replaceable snapshot, downstream sinks
  * overwrite. Optional TTL evicts idle keys (their funnel forgets;
  * disclosed churn trade).
  */
object FunnelStream {

  case class Ev(user_id: Long, state: String, ts_us: Long, event_id: Long)
  case class FunnelState(nSeen: Long, positions: Array[Long])
  case class FunnelRow(user_id: Long, stage: Long, positions: Array[Long])

  implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
  implicit val stEnc: Encoder[FunnelState] = Encoders.product[FunnelState]
  implicit val outEnc: Encoder[FunnelRow] = Encoders.product[FunnelRow]
  implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

  private def foldOne(steps: Seq[String], ttl: Option[String])(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[FunnelState]
  ): Iterator[FunnelRow] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val ordered = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var st = state.getOption.getOrElse(FunnelState(0L, Array.empty[Long]))
    var n = st.nSeen
    var pos = st.positions
    ordered.foreach { e =>
      n += 1
      if (pos.length < steps.length && e.state == steps(pos.length)) pos = pos :+ n
    }
    val next = FunnelState(n, pos)
    state.update(next)
    ttl.foreach(state.setTimeoutDuration)
    Iterator.single(FunnelRow(userId, pos.length.toLong, pos))
  }

  /** Wire the funnel fold onto a keyed event stream. */
  def funnel(
      events: Dataset[Ev],
      steps: Seq[String],
      stateTtl: Option[String] = None
  ): Dataset[FunnelRow] = {
    require(steps.nonEmpty, "need at least one funnel step")
    val timeout = stateTtl
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), timeout)(foldOne(steps, stateTtl) _)
  }
}
