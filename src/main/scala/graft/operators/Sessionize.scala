package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Gap-based sessionization of event streams: consecutive events of the
  * same key belong to one session while the inter-event gap stays within
  * `maxGap`; a larger gap starts a new session.
  *
  * Scale design (100 TB posture): ONE shuffle, keyed by the session key.
  * Both window passes (lag to detect gaps, running sum to number sessions)
  * and the final per-session aggregation declare the same partitioning, so
  * Catalyst plans a single exchange and runs the windows back-to-back in
  * one stage — `.explain` shows one Exchange feeding two Window operators
  * and a partial-aggregate. Skewed keys (one user with millions of events)
  * are the known hazard; mitigate upstream with [[Skew]] salting or a
  * per-day pre-split of the key when a key's event count breaks the
  * per-partition memory budget.
  */
object Sessionize {

  /** Events annotated with a per-key session index (0-based, in time
    * order). `ts` must be a NUMERIC epoch column (`ts - prev > maxGap` is
    * arithmetic; a TimestampType column would subtract to an interval and
    * fail analysis — convert with `unix_micros` first, or use
    * [[sessionWindowsStream]] which takes real timestamps). Ties are
    * broken by `tieBreak` for a total order.
    */
  def withSessionIds(
      events: DataFrame,
      key: Column,
      ts: Column,
      maxGap: Long,
      tieBreak: Column
  ): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
    val prevTs = lag(ts, 1).over(w)
    val newSession = when(prevTs.isNull || (ts - prevTs) > maxGap, lit(1L)).otherwise(lit(0L))
    events
      .withColumn("session_idx", sum(newSession).over(w) - lit(1L))
  }

  /** Native `session_window` formulation of the same rollup — the
    * STREAMING-capable path: under `readStream` + `withWatermark` this
    * exact plan runs incrementally with state eviction at the watermark,
    * which the lag/running-sum formulation cannot (windows over unbounded
    * streams are unsupported).
    *
    * Boundary semantics MATCH [[sessions]], including at the exact
    * threshold: the built-in merges an event landing exactly on the
    * previous window's end (`prev + gap`), just as [[sessions]] splits
    * only on strictly-greater gaps — SessionizeSpec pins both the
    * random-gap equivalence and the exact-boundary case. `tsMicros` is
    * epoch-micros.
    */
  def sessionWindows(
      events: DataFrame,
      key: Column,
      tsMicros: Column,
      gap: String,
      valueCol: Column
  ): DataFrame =
    events
      .groupBy(key.as("key"), session_window(timestamp_micros(tsMicros), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), decimalSum(valueCol).as("sum_value"))
      .select(
        col("key"),
        unix_micros(col("w.start")).as("session_start"),
        col("n_events"),
        col("sum_value")
      )

  /** Streaming form of [[sessionWindows]]: same rollup over a streaming
    * DataFrame with a real timestamp column, watermarked so session state
    * is finalized (emitted in Append mode) and evicted once the watermark
    * passes a session's end — the bounded-state contract for unbounded
    * event streams. SessionizeSpec drives it through MemoryStream.
    */
  def sessionWindowsStream(
      events: DataFrame,
      key: Column,
      tsCol: String,
      gap: String,
      watermarkDelay: String,
      valueCol: Column
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(key.as("key"), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), decimalSum(valueCol).as("sum_value"))
      .select(
        col("key"),
        unix_micros(col("w.start")).as("session_start"),
        col("n_events"),
        col("sum_value")
      )

  /** Per-session rollup: bounds, size, and value sum for each
    * (key, session) — the standard shape fed to engagement / training-
    * example aggregation.
    */
  def sessions(
      events: DataFrame,
      key: Column,
      ts: Column,
      maxGap: Long,
      tieBreak: Column,
      valueCol: Column
  ): DataFrame =
    withSessionIds(events, key, ts, maxGap, tieBreak)
      .groupBy(key.as("key"), col("session_idx"))
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_events"),
        decimalSum(valueCol).as("sum_value")
      )

  /** [[sessions]] with the value sum emitted as exact integer CENTS
    * (`sum_value_cents`, BIGINT) instead of a double: the whole output
    * contract is integer-typed, so a gate that hashes RENDERED values
    * (rather than comparing numerics) has nothing float-formatted to
    * diverge on — `-0.0` vs `0.0`, shortest-decimal vs `%.17g`, and
    * locale formatting are all double-rendering hazards that survive
    * value-exact sums. The cast chain is exact end-to-end: the 2-dp-valued
    * double casts losslessly to DECIMAL(18,2), the ×100 stays decimal,
    * and the cents values are integers so the LONG cast drops only a
    * zero scale.
    */
  def sessionsCents(
      events: DataFrame,
      key: Column,
      ts: Column,
      maxGap: Long,
      tieBreak: Column,
      valueCol: Column
  ): DataFrame =
    withSessionIds(events, key, ts, maxGap, tieBreak)
      .groupBy(key.as("key"), col("session_idx"))
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_events"),
        sum((valueCol.cast(DecimalType(18, 2)) * lit(100)).cast(LongType))
          .as("sum_value_cents")
      )

  /** Order-independent value sum. `round(sum(double), 2)` is a flaky
    * cross-engine contract: partial-agg merge order differs between Spark
    * and any oracle engine by 1 ulp, which flips a half-cent boundary.
    * Summing after a DECIMAL(18,2) cast is exact integer arithmetic — the
    * input values are 2-dp-valued doubles, so the cast itself is the
    * deterministic nearest-2-dp rounding on every engine — and the final
    * cast back to double is a single correctly-rounded conversion.
    */
  private[graft] def decimalSum(valueCol: Column): Column =
    sum(valueCol.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Ordered-funnel stage assignment — the conversion-analytics verb
    * (MATCH_RECOGNIZE's most common pattern, done with relational
    * operators): for each key, how far through the ordered step list
    * `steps` did its event stream get? Step i+1 counts only STRICTLY
    * AFTER the position where step i was first satisfied (the standard
    * funnel semantics: a purchase before the signup does not convert).
    *
    * Output per key: (key, stage = number of steps completed, pos_1 …
    * pos_k) where pos_i is the 1-based position (in the key's (ts,
    * tieBreak) order) of the event that satisfied step i, −1 once the
    * funnel broke (positions are prefix-monotone by construction).
    *
    * Scale shape: ONE key-bounded row_number window (the x17/x85
    * discipline), then per step one filtered key-keyed join + min
    * hash-agg — k small and fixed, every exchange on the key. A missed
    * step poisons the rest via a MaxValue sentinel, not a driver branch.
    */
  def funnelStages(
      df: DataFrame,
      key: Column,
      ts: Column,
      tieBreak: Column,
      state: Column,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__tb"))
    // localCheckpoint, NOT persist: the positioned frame appears ~2k+1
    // times in the final plan (once per step join plus the key universe),
    // and as a cached-but-live subtree every occurrence re-enters Catalyst
    // canonicalization/optimization — measured ~50 driver-CPU-seconds at
    // sf0.1 inside a session with a large plan cache. As an eager
    // checkpoint it is a LEAF: the step chain optimizes in milliseconds
    // and the blocks are GC-reclaimed when unreferenced.
    val p = df
      .select(key.as("__k"), ts.as("__t"), tieBreak.as("__tb"), state.as("__s"))
      .withColumn("__pos", row_number().over(w).cast("long"))
      .localCheckpoint()
    var acc = p.select(col("__k")).distinct().withColumn("__prev", lit(0L))
    steps.zipWithIndex.foreach { case (st, i) =>
      val cName = s"pos_${i + 1}"
      val mins = p
        .where(col("__s") === lit(st))
        .join(acc.select(col("__k"), col("__prev")), Seq("__k"))
        .where(col("__pos") > col("__prev"))
        .groupBy(col("__k"))
        .agg(min(col("__pos")).as(cName))
      acc = acc
        .join(mins, Seq("__k"), "left")
        .withColumn("__prev", coalesce(col(cName), lit(Long.MaxValue)))
    }
    val stage = steps.indices
      .map(i => when(col(s"pos_${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    acc.select(
      col("__k").as("key") +:
        stage.as("stage") +:
        steps.indices.map(i => coalesce(col(s"pos_${i + 1}"), lit(-1L)).as(s"pos_${i + 1}")): _*)
  }

  /** Per-session event-type PATHS — the "top user journeys" verb product
    * analytics builds on sessionization (and the whole-sequence
    * complement of [[transitionCounts]]' first-order view): each
    * (key, session) renders its events, in (ts, tieBreak) order, as a
    * `'>'`-joined state string, and identical paths are counted
    * corpus-wide. Downstream `orderBy(count desc, path).limit(k)` plans
    * as TakeOrderedAndProject — the x38 top-k discipline.
    *
    * Scale shape: sessions come from [[withSessionIds]]' single keyed
    * exchange; the path render is one per-(key, session) hash agg whose
    * collect_list is SESSION-bounded (the same bound the session
    * aggregation itself carries), then one path-keyed count agg with
    * map-side partials. Path strings are bounded by session length —
    * callers with pathological sessions cap upstream (the Sessionize
    * skew note applies).
    */
  def sessionPaths(
      events: DataFrame,
      key: Column,
      ts: Column,
      maxGap: Long,
      tieBreak: Column,
      state: Column
  ): DataFrame =
    withSessionIds(
      events.select(key.as("__k"), ts.as("__t"), tieBreak.as("__tb"), state.as("__s")),
      col("__k"), col("__t"), maxGap, col("__tb"))
      .groupBy(col("__k"), col("session_idx"))
      .agg(
        concat_ws(
          ">",
          transform(
            sort_array(collect_list(struct(col("__t"), col("__tb"), col("__s")))),
            e => e.getField("__s"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))

  /** First-order transition matrix over each key's time-ordered event
    * stream — the user-journey / Markov-chain summary sessionization's
    * island view doesn't give: for every ordered state pair, how many
    * times did `prev → next` occur, and what fraction of departures from
    * `prev` does that represent (integer ppm, the engine's exact-replay
    * convention). The classic uses: funnel analysis, anomalous-sequence
    * screens, and the transition prior behind next-event prediction.
    *
    * (`ts`, `tieBreak`) must totalize order within a key, same contract
    * as [[withSessionIds]]. Self-transitions count like any other.
    *
    * Scale shape: ONE key-bounded lag window (partition = the key, the
    * x17 discipline — never a global order), one (prev, next) hash agg
    * with map-side partials, and the per-prev totals join back is
    * state-vocabulary-bounded — broadcastable by construction.
    */
  def transitionCounts(
      df: DataFrame,
      key: Column,
      ts: Column,
      tieBreak: Column,
      state: Column
  ): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__tb"))
    val counts = df
      .select(key.as("__k"), ts.as("__t"), tieBreak.as("__tb"), state.as("next_state"))
      .withColumn("prev_state", lag(col("next_state"), 1).over(w))
      .where(col("prev_state").isNotNull)
      .groupBy(col("prev_state"), col("next_state"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("prev_state")).agg(sum(col("n")).as("__tot"))
    counts
      .join(broadcast(totals), "prev_state")
      .select(
        col("prev_state"),
        col("next_state"),
        col("n"),
        expr("CAST(n * 1000000 div __tot AS BIGINT)").as("p_ppm"))
  }
}
