package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.MgBuffer

/** Streaming heavy hitters: a per-key Misra-Gries sketch maintained
  * continuously over an unbounded token stream — "which tokens dominate
  * this source, so far" — the streaming twin of the batch
  * [[graft.operators.TextAnalysis.heavyTokens]] pass, with the same
  * [[MgBuffer]] eviction semantics and therefore (spec-pinned) exactly the
  * state a single sequential Misra-Gries fold over the concatenated stream
  * would hold. The batch/stream twin discipline of [[DistinctStream]] /
  * [[DeltaStream]] / [[IslandsStream]].
  *
  * State contract: at most k (token, counter) pairs plus one total per
  * key — O(k) bounded regardless of stream length or vocabulary, the
  * property that makes heavy hitters maintainable on an unbounded stream
  * (exact counts grow with the open vocabulary and never stop). The
  * classic guarantee holds at every emission: any token whose true count
  * so far exceeds n_processed / k is in the candidate set, and each
  * surviving counter lower-bounds the true count with deficit at most
  * (n_processed − Σcounters) / (k+1).
  *
  * Emission (Update mode): one (key, token, count_lb, n_processed) row per
  * surviving candidate per micro-batch that touched the key — a running
  * watchlist, not a finalized answer; the batch recount pass (x43) is the
  * exact follow-up once data is at rest. An optional processing-time TTL
  * evicts idle keys (forgets, no emission — a running sketch has no
  * meaningful final row).
  */
object HeavyHittersStream {

  case class Tok(key: String, token: String)
  case class MgState(tokens: Array[String], counts: Array[Long], n: Long)
  case class Candidate(key: String, token: String, count_lb: Long, n_processed: Long)

  implicit val tokEnc: Encoder[Tok] = Encoders.product[Tok]
  implicit val stEnc: Encoder[MgState] = Encoders.product[MgState]
  implicit val outEnc: Encoder[Candidate] = Encoders.product[Candidate]
  implicit val keyEnc: Encoder[String] = Encoders.STRING

  private def fold(k: Int, ttl: Option[String])(
      key: String,
      toks: Iterator[Tok],
      state: GroupState[MgState]
  ): Iterator[Candidate] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val buf = new MgBuffer(k)
    var n = 0L
    state.getOption.foreach { s =>
      var i = 0
      while (i < s.tokens.length) {
        buf.counts.put(s.tokens(i), java.lang.Long.valueOf(s.counts(i)))
        i += 1
      }
      n = s.n
    }
    toks.foreach { t =>
      if (t.token != null) { buf.add(t.token); n += 1 }
    }
    // deterministic state + emission order (the HashMap's own order is not)
    val entries = {
      val arr = new Array[(String, Long)](buf.counts.size)
      val it = buf.counts.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        val e = it.next(); arr(i) = (e.getKey, e.getValue.longValue); i += 1
      }
      arr.sortBy(_._1)
    }
    state.update(MgState(entries.map(_._1), entries.map(_._2), n))
    ttl.foreach(state.setTimeoutDuration)
    val total = n
    entries.iterator.map { case (t, c) => Candidate(key, t, c, total) }
  }

  /** Wire the Misra-Gries fold onto a keyed token stream.
    *
    * @param k        sketch width; every token with true frequency above
    *                 1/k of the key's stream survives
    * @param stateTtl optional processing-time TTL after which an idle
    *                 key's sketch is evicted
    */
  def candidates(
      toks: Dataset[Tok],
      k: Int,
      stateTtl: Option[String] = None
  ): Dataset[Candidate] = {
    require(k >= 1, s"k must be at least 1, got $k")
    val timeout = stateTtl
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    toks
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(), timeout)(fold(k, stateTtl) _)
  }
}
