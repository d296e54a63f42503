package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.KmvBuffer
import graft.operators.DistinctSketch

/** Streaming form of [[graft.operators.DistinctSketch.kmvDistinct]]: a
  * per-key distinct-count estimate maintained continuously over an
  * unbounded element stream — "distinct users per event type, so far" —
  * with the same KMV sketch, the same md5-derived hash, and therefore the
  * SAME NUMBERS as the batch operator over the same data (spec-pinned):
  * the batch/stream twin discipline of [[DeltaStream]] / [[IslandsStream]].
  *
  * State contract: one sorted array of ≤ k longs per key — O(k) bounded
  * regardless of stream length or cardinality, the property that makes a
  * distinct count maintainable on an unbounded stream at all (exact
  * distinct state grows with cardinality and never stops). Merging a
  * micro-batch is the same union-retrim the batch aggregate's merge uses,
  * which is exactly correct: the k global minima are a subset of
  * state ∪ batch minima.
  *
  * Emission: one (key, n_tracked, est_distinct) row per key per
  * micro-batch that touched it (Update-mode semantics — a running
  * estimate, not a finalized window). An optional processing-time TTL
  * evicts idle keys for bounded state under key churn; eviction FORGETS
  * (the estimate restarts), it does not emit — a distinct count has no
  * meaningful "final" row.
  */
object DistinctStream {

  case class El(key: String, value: String)
  case class MinsState(mins: Array[Long])
  case class Estimate(key: String, n_tracked: Long, est_distinct: Long)

  implicit val elEnc: Encoder[El] = Encoders.product[El]
  implicit val stEnc: Encoder[MinsState] = Encoders.product[MinsState]
  implicit val outEnc: Encoder[Estimate] = Encoders.product[Estimate]
  implicit val keyEnc: Encoder[String] = Encoders.STRING

  private def fold(k: Int, ttl: Option[String])(
      key: String,
      els: Iterator[El],
      state: GroupState[MinsState]
  ): Iterator[Estimate] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val buf = new KmvBuffer(k)
    state.getOption.foreach(_.mins.foreach(buf.add))
    els.foreach(e => if (e.value != null) buf.add(DistinctSketch.hash40Scala(e.value)))
    val mins = new Array[Long](buf.mins.size)
    val it = buf.mins.iterator()
    var i = 0
    while (it.hasNext) { mins(i) = it.next().longValue; i += 1 }
    state.update(MinsState(mins))
    ttl.foreach(state.setTimeoutDuration)
    val est =
      if (mins.length < k) mins.length.toLong
      else (k - 1).toLong * DistinctSketch.Domain / math.max(mins.last, 1L)
    Iterator.single(Estimate(key, mins.length.toLong, est))
  }

  /** Wire the KMV fold onto a keyed element stream.
    *
    * @param stateTtl optional processing-time TTL after which an idle
    *                 key's sketch is evicted (forgets, no emission)
    */
  def estimates(
      elems: Dataset[El],
      k: Int,
      stateTtl: Option[String] = None
  ): Dataset[Estimate] = {
    require(k >= 2, s"k must be at least 2, got $k")
    val timeout = stateTtl
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    elems
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(), timeout)(fold(k, stateTtl) _)
  }
}
