package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming formulation of the snapshot-diff pipeline
  * (SURVEY.md §2.5 option (b)): per-SYMBOL state in
  * `flatMapGroupsWithState` holding (prevClose, prevOI), replacing the
  * batch formulation's sink-tail read + broadcast join.
  *
  * Emission semantics: one output row PER SNAPSHOT — within a micro-batch,
  * each snapshot of a symbol diffs against the one before it (in
  * `batchSeq` arrival order), so a symbol seen k times emits k rows. This
  * generalizes the batch path, which keep-last-dedups to one snapshot per
  * symbol per batch BEFORE the diff: feed keep-last-deduped micro-batches
  * and the two paths produce identical rows (DeltaStreamSpec pins this
  * equivalence property). First sight of a symbol → Open = 0, OI_Change = 0;
  * subsequently Open = prev Close, OI_Change = OI − prev OI (reference
  * main.py:294-308).
  *
  * State eviction: by default state lives forever (NoTimeout) — the exact
  * analog of a reference sink that never rotates. Pass `stateTtl` to evict
  * symbols idle longer than that processing-time duration, the watermark
  * analog of the reference's tail-300 bounded lookback (main.py:260): an
  * evicted symbol's next snapshot restarts at Open = 0 / OI_Change = 0,
  * exactly like falling out of the reference's 300-row window.
  *
  * Scale: state is partitioned by SYMBOL across executors by the streaming
  * state store; throughput is bounded by state-store shuffle, not by any
  * driver-side structure. Checkpointing gives the exactly-once upgrade the
  * reference lacks (SURVEY.md §2.5).
  */
object DeltaStream {

  case class Snap(symbol: String, close: Double, oi: Long, batchSeq: Long)
  case class SymbolState(prevClose: Double, prevOI: Long)
  case class Diffed(symbol: String, close: Double, oi: Long, open: Double, oiChange: Long)

  implicit val snapEnc: Encoder[Snap] = Encoders.product[Snap]
  implicit val stateEnc: Encoder[SymbolState] = Encoders.product[SymbolState]
  implicit val diffedEnc: Encoder[Diffed] = Encoders.product[Diffed]
  implicit val keyEnc: Encoder[String] = Encoders.STRING

  private def diffOne(stateTtl: Option[String])(
      symbol: String,
      snaps: Iterator[Snap],
      state: GroupState[SymbolState]
  ): Iterator[Diffed] = {
    if (state.hasTimedOut) {
      // idle past the TTL: drop the symbol's state; no rows to emit
      state.remove()
      return Iterator.empty
    }
    // within a micro-batch, process snapshots in arrival order; each one
    // diffs against the previous (dict-overwrite keep-last semantics)
    val ordered = snaps.toSeq.sortBy(_.batchSeq)
    val out = Seq.newBuilder[Diffed]
    var st = state.getOption
    ordered.foreach { s =>
      st match {
        case Some(SymbolState(pc, poi)) =>
          out += Diffed(s.symbol, s.close, s.oi, pc, s.oi - poi)
        case None =>
          out += Diffed(s.symbol, s.close, s.oi, 0.0, 0L)
      }
      st = Some(SymbolState(s.close, s.oi))
    }
    st.foreach(state.update)
    stateTtl.foreach(state.setTimeoutDuration)
    out.result().iterator
  }

  /** Kept for binary/spec compatibility: the no-TTL diff function. */
  def diffOne(
      symbol: String,
      snaps: Iterator[Snap],
      state: GroupState[SymbolState]
  ): Iterator[Diffed] = diffOne(None)(symbol, snaps, state)

  /** Wire the stateful diff onto a stream of snapshots.
    *
    * @param stateTtl optional processing-time TTL (e.g. "1 hour") after
    *                 which an idle symbol's state is evicted
    */
  def withDelta(snaps: Dataset[Snap], stateTtl: Option[String] = None): Dataset[Diffed] = {
    val timeout = stateTtl
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    snaps
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(diffOne(stateTtl) _)
  }
}
