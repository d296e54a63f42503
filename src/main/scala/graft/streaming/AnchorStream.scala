package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{KmvBuffer, MgBuffer}
import graft.operators.DistinctSketch

/** Streaming anchor-text aggregation: per link TARGET, a continuously
  * maintained (in-link count, distinct-source estimate, plurality
  * anchor string) over an unbounded (target, source doc, text) link
  * stream — the streaming twin of
  * [[graft.operators.AnchorText.aggregate]], ninth member of the
  * batch/stream twin family ([[DeltaStream]] / [[DistinctStream]] /
  * [[HeavyHittersStream]] / …), and the composition is the point: a
  * web-scale target's state cannot hold its distinct sources (millions)
  * or its distinct anchor strings (open vocabulary), so the twin swaps
  * each unbounded exact statistic for the SAME bounded sketch the batch
  * family already oracles —
  *
  *   - `n_links`: one long, exact;
  *   - distinct sources: the [[KmvBuffer]] KMV sketch over
  *     [[DistinctSketch.hash40Scala]] hashes (exact below k, the
  *     (k−1)·2⁴⁰ div h₍ₖ₎ estimate above — the literal x57 formula, so
  *     batch and stream agree number-for-number);
  *   - plurality text: the [[MgBuffer]] Misra-Gries sketch — any text
  *     with frequency > n/k survives, counters never overcount, and in
  *     the no-eviction regime (≤ k distinct texts per target — true for
  *     real anchor vocabularies per page, and spec-pinned) the sketch
  *     IS the exact count table and the emitted plurality equals the
  *     batch `min(struct(-cnt, text))` argmax, tie-break included.
  *
  * State contract: O(mgK + kmvK) per target regardless of stream
  * length. Emission (Update mode): one row per target per micro-batch
  * that touched it — a running answer; the batch rollup is the exact
  * pass once data is at rest. Optional processing-time TTL evicts idle
  * targets (forgets, no emission).
  */
object AnchorStream {

  case class Link(target: String, src_doc: Long, text: String)
  case class AnchorState(
      nLinks: Long,
      mgTexts: Array[String],
      mgCounts: Array[Long],
      kmvMins: Array[Long])
  case class AnchorStats(
      target: String,
      n_links: Long,
      est_src_docs: Long,
      top_text: String,
      top_count_lb: Long)

  implicit val linkEnc: Encoder[Link] = Encoders.product[Link]
  implicit val stEnc: Encoder[AnchorState] = Encoders.product[AnchorState]
  implicit val outEnc: Encoder[AnchorStats] = Encoders.product[AnchorStats]
  implicit val keyEnc: Encoder[String] = Encoders.STRING

  private def fold(mgK: Int, kmvK: Int, ttl: Option[String])(
      target: String,
      links: Iterator[Link],
      state: GroupState[AnchorState]
  ): Iterator[AnchorStats] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val mg = new MgBuffer(mgK)
    val kmv = new KmvBuffer(kmvK)
    var n = 0L
    state.getOption.foreach { s =>
      n = s.nLinks
      var i = 0
      while (i < s.mgTexts.length) {
        mg.counts.put(s.mgTexts(i), java.lang.Long.valueOf(s.mgCounts(i)))
        i += 1
      }
      s.kmvMins.foreach(kmv.add)
    }
    links.foreach { l =>
      n += 1
      mg.add(l.text)
      kmv.add(DistinctSketch.hash40Scala(l.src_doc.toString))
    }

    val texts = new Array[String](mg.counts.size)
    val counts = new Array[Long](mg.counts.size)
    var i = 0
    mg.counts.forEach { (t, c) => texts(i) = t; counts(i) = c.longValue; i += 1 }
    val mins = new Array[Long](kmv.mins.size)
    val it = kmv.mins.iterator()
    i = 0
    while (it.hasNext) { mins(i) = it.next().longValue; i += 1 }
    state.update(AnchorState(n, texts, counts, mins))
    ttl.foreach(state.setTimeoutDuration)

    // the x57 estimate formula, greatest(kth, 1) guard included
    val est =
      if (mins.length < kmvK) mins.length.toLong
      else ((kmvK - 1).toLong * DistinctSketch.Domain) / math.max(mins(kmvK - 1), 1L)
    // the batch argmax: (count desc, text asc)
    var top: String = null
    var topC = -1L
    var j = 0
    while (j < texts.length) {
      if (counts(j) > topC || (counts(j) == topC && (top == null || texts(j) < top))) {
        top = texts(j); topC = counts(j)
      }
      j += 1
    }
    Iterator.single(AnchorStats(target, n, est, top, math.max(topC, 0L)))
  }

  /** Continuous per-target anchor statistics over `links`. */
  def stats(
      links: Dataset[Link],
      mgK: Int = 16,
      kmvK: Int = 64,
      ttl: Option[String] = None
  ): Dataset[AnchorStats] = {
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    links
      .groupByKey(_.target)
      .flatMapGroupsWithState(OutputMode.Update(), timeout)(fold(mgK, kmvK, ttl))
  }
}
