package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.DistinctSketch

/** Streaming weighted sampling without replacement: a per-group
  * k-member sample maintained continuously over an unbounded key stream,
  * with inclusion odds proportional to weight — the streaming twin of the
  * batch sequential-Poisson sample ([[graft.operators.Sampling
  * .weightedSamplePerGroup]], x59), and the fifth batch/stream twin after
  * delta, islands, distinct count, and heavy hitters.
  *
  * Works because sequential Poisson sampling IS a bounded-state
  * streaming algorithm: membership = the k smallest integer priorities
  * `hash40(key) div max(weight, 1)`, and "k smallest so far" needs
  * exactly k entries of state per group — elements can only leave when a
  * smaller priority arrives, never re-enter. The stream's sample after
  * any prefix EQUALS the batch sample of that prefix (spec-pinned),
  * with the same (priority, md5(key), key) total order breaking ties.
  *
  * Re-observing a key with the same weight is a no-op (the identical
  * entry sorts identically and the state set dedups it), matching the
  * batch operator over distinct (key, weight) rows; a key whose weight
  * CHANGES is a new observation on both sides, same as batch.
  *
  * Emission (Update mode): the group's FULL current sample each
  * micro-batch that touched it — ≤ k rows, a replaceable snapshot, so a
  * downstream sink overwrites rather than appends. Optional TTL evicts
  * idle groups (forgets; a running sample has no final row).
  */
object SampleStream {

  case class El(group: String, key: String, weight: Long)
  case class Entry(priority: Long, md5: String, key: String, weight: Long)
  case class SampleState(entries: Array[Entry])
  case class Member(group: String, key: String, weight: Long, priority: Long)

  implicit val elEnc: Encoder[El] = Encoders.product[El]
  implicit val stEnc: Encoder[SampleState] = Encoders.product[SampleState]
  implicit val outEnc: Encoder[Member] = Encoders.product[Member]
  implicit val keyEnc: Encoder[String] = Encoders.STRING

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  // weight participates in the order: the batch operator samples distinct
  // (key, weight) ROWS, so re-observing a key with a CHANGED weight that
  // happens to land on the SAME priority (e.g. both weights exceed
  // hash40(key), giving priority 0) must coexist in state as a second
  // entry, not be swallowed by a (priority, md5, key)-only set identity
  private val entryOrd: Ordering[Entry] =
    Ordering.by(e => (e.priority, e.md5, e.key, e.weight))

  private def fold(k: Int, ttl: Option[String])(
      group: String,
      els: Iterator[El],
      state: GroupState[SampleState]
  ): Iterator[Member] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val set = new java.util.TreeSet[Entry](entryOrd)
    state.getOption.foreach(_.entries.foreach(set.add))
    els.foreach { e =>
      if (e.key != null) {
        val w = math.max(e.weight, 1L)
        val pri = DistinctSketch.hash40Scala(e.key) / w
        set.add(Entry(pri, md5Hex(e.key), e.key, w))
        if (set.size > k) { set.remove(set.last()); () }
      }
    }
    val entries = new Array[Entry](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { entries(i) = it.next(); i += 1 }
    state.update(SampleState(entries))
    ttl.foreach(state.setTimeoutDuration)
    entries.iterator.map(e => Member(group, e.key, e.weight, e.priority))
  }

  /** Wire the bounded-state sample fold onto a keyed element stream. */
  def samples(
      elems: Dataset[El],
      k: Int,
      stateTtl: Option[String] = None
  ): Dataset[Member] = {
    require(k >= 1, s"k must be at least 1, got $k")
    val timeout = stateTtl
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    elems
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update(), timeout)(fold(k, stateTtl) _)
  }
}
