package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // (user, event_id, ts, value); gap threshold 100 in these tests
  private lazy val events = Seq(
    (1L, 1L, 1000L, 1.0),
    (1L, 2L, 1050L, 2.0), // same session (gap 50)
    (1L, 3L, 1200L, 4.0), // new session (gap 150)
    (1L, 4L, 1290L, 8.0), // same session (gap 90)
    (2L, 5L, 500L, 16.0), // other user, own numbering
    (2L, 6L, 5000L, 32.0) // new session (gap 4500)
  ).toDF("user_id", "event_id", "ts", "value")

  test("session ids: gaps > maxGap split, per-key 0-based numbering") {
    val out = Sessionize
      .withSessionIds(events, col("user_id"), col("ts"), 100L, col("event_id"))
      .select("user_id", "event_id", "session_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(
      (1L, 1L) -> 0L, (1L, 2L) -> 0L, (1L, 3L) -> 1L, (1L, 4L) -> 1L,
      (2L, 5L) -> 0L, (2L, 6L) -> 1L
    ))
  }

  test("exact-gap boundary stays in the same session (strict > splits)") {
    val e = Seq((1L, 1L, 0L, 1.0), (1L, 2L, 100L, 1.0), (1L, 3L, 201L, 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val idx = Sessionize
      .withSessionIds(e, col("user_id"), col("ts"), 100L, col("event_id"))
      .orderBy("event_id").select("session_idx").as[Long].collect()
    assert(idx.toSeq === Seq(0L, 0L, 1L))
  }

  test("session rollup: bounds, sizes, sums") {
    val out = Sessionize
      .sessions(events, col("user_id"), col("ts"), 100L, col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out((1L, 0L)) === ((1000L, 1050L, 2L, 3.0)))
    assert(out((1L, 1L)) === ((1200L, 1290L, 2L, 12.0)))
    assert(out((2L, 0L)) === ((500L, 500L, 1L, 16.0)))
    assert(out((2L, 1L)) === ((5000L, 5000L, 1L, 32.0)))
  }

  test("sessionsCents: all-integer schema, cents equal the decimal sum x 100") {
    val out = Sessionize
      .sessionsCents(events, col("user_id"), col("ts"), 100L, col("event_id"), col("value"))
    // every output column integer-typed: nothing float-rendered for a hash gate
    assert(out.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType))
    val cents = out
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5))
      .toMap
    val dbl = Sessionize
      .sessions(events, col("user_id"), col("ts"), 100L, col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5))
      .toMap
    assert(cents.keySet === dbl.keySet)
    cents.foreach { case (k, c) => assert(c === math.round(dbl(k) * 100)) }
  }

  test("native session_window agrees with the gap-fold away from exact boundaries") {
    // seeded random events with gaps never exactly equal to the threshold
    val rnd = new scala.util.Random(7)
    val rows = (1 to 3).flatMap { u =>
      var ts = 0L
      (1 to 40).map { i =>
        ts += (rnd.nextInt(200) * 2 + 1) // odd deltas; gap threshold is even
        (u.toLong, (u * 1000 + i).toLong, ts, rnd.nextInt(10).toDouble)
      }
    }
    val df = rows.toDF("user_id", "event_id", "ts", "value")
    val gapUs = 100L
    val fold = Sessionize
      .sessions(df, col("user_id"), col("ts"), gapUs, col("event_id"), col("value"))
      .select("key", "session_start", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val native = Sessionize
      .sessionWindows(df, col("user_id"), col("ts"), "100 microseconds", col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(native === fold)
  }

  test("exact-gap boundary: both formulations merge (inclusive threshold)") {
    val df = Seq((1L, 1L, 0L, 1.0), (1L, 2L, 100L, 1.0), (1L, 3L, 201L, 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val foldN = Sessionize
      .sessions(df, col("user_id"), col("ts"), 100L, col("event_id"), col("value"))
      .count()
    val nativeN = Sessionize
      .sessionWindows(df, col("user_id"), col("ts"), "100 microseconds", col("value"))
      .count()
    assert(foldN === 2L) // {0,100} merge at the exact gap; 201 splits
    assert(nativeN === 2L) // built-in merges on the window-end boundary too
  }

  test("streaming session windows: sessions finalize as the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    def t(s: Long) = new java.sql.Timestamp(s * 1000)

    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val query = Sessionize
      .sessionWindowsStream(
        input.toDF().toDF("user_id", "ts", "value"),
        col("user_id"), "ts", "10 seconds", "5 seconds", col("value"))
      .writeStream
      .format("memory")
      .queryName("sess_out")
      .outputMode(OutputMode.Append())
      .start()

    try {
      // two sessions for user 1: {0s, 5s} and {30s}; nothing final yet
      input.addData((1L, t(0), 1.0), (1L, t(5), 2.0), (1L, t(30), 4.0))
      query.processAllAvailable()
      // watermark mover: event at 200s → watermark 195s → both finalize
      input.addData((2L, t(200), 8.0))
      query.processAllAvailable()
      val rows = spark.table("sess_out")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains((1L, 0L, 2L, 3.0)))        // session {0s,5s}
      assert(rows.contains((1L, 30000000L, 1L, 4.0))) // session {30s}
    } finally query.stop()
  }

  test("plan: windows + rollup share one exchange (single shuffle)") {
    val plan = Sessionize
      .sessions(events, col("user_id"), col("ts"), 100L, col("event_id"), col("value"))
      .queryExecution.executedPlan match {
      // unwrap AQE: the adaptive node hides the inner plan from collect()
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.length === 1, s"expected 1 exchange, plan:\n$plan")
  }
  test("funnelStages: strict after-previous ordering, broken funnels poison the tail") {
    val ev = Seq(
      // u1 completes a→b→c in order, with decoys
      (1L, 1L, 10L, "b"), (1L, 2L, 20L, "a"), (1L, 3L, 30L, "b"), (1L, 4L, 40L, "c"),
      // u2: c before b — stage stops at a, then b, c never after b? b at 30, c at 25 → stage 2
      (2L, 5L, 10L, "a"), (2L, 6L, 25L, "c"), (2L, 7L, 30L, "b"),
      // u3: never does a → stage 0 even with b and c present
      (3L, 8L, 10L, "b"), (3L, 9L, 20L, "c"),
      // u4: a only
      (4L, 10L, 10L, "a")
    ).toDF("user_id", "event_id", "ts", "state")
    val got = Sessionize
      .funnelStages(ev, col("user_id"), col("ts"), col("event_id"), col("state"),
        steps = Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 3L, 2L, 3L, 4L),   // a at pos2 (pos1 is the decoy b), b at pos3, c at pos4
      (2L, 2L, 1L, 3L, -1L),  // c at pos2 precedes b — no c AFTER b
      (3L, 0L, -1L, -1L, -1L),
      (4L, 1L, 1L, -1L, -1L)))
  }

  test("funnelStages: same-ts tie-break and partitioning invariance") {
    // a and b share ts 10: event_id puts a first, so b at the same ts converts
    val ev = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 10L, "b"),
      (2L, 3L, 10L, "b"), (2L, 4L, 10L, "a") // reversed ids: b precedes a → stage 1
    ).toDF("user_id", "event_id", "ts", "state")
    def run(p: Int) = Sessionize
      .funnelStages(ev.repartition(p), col("user_id"), col("ts"), col("event_id"), col("state"),
        steps = Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(1)
    assert(a === run(7))
    assert(a === Set((1L, 2L), (2L, 1L)))
  }

  test("sessionPaths: gap splitting, within-session order, identical paths counted corpus-wide") {
    // user 1: [a,b] then (gap) [a,b]; user 2: [a,b]; user 3: [b,a]
    val ev = Seq(
      (1L, 1L, 100L, "a"), (1L, 2L, 150L, "b"),
      (1L, 3L, 900L, "a"), (1L, 4L, 950L, "b"),
      (2L, 5L, 100L, "a"), (2L, 6L, 150L, "b"),
      (3L, 7L, 100L, "b"), (3L, 8L, 150L, "a")
    ).toDF("user_id", "event_id", "ts", "state")
    val got = Sessionize
      .sessionPaths(ev, col("user_id"), col("ts"), maxGap = 200L,
        tieBreak = col("event_id"), state = col("state"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a>b" -> 3L, "b>a" -> 1L))
    // same-ts ties follow the tie-break
    val tie = Seq((9L, 1L, 100L, "x"), (9L, 2L, 100L, "y")).toDF("user_id", "event_id", "ts", "state")
    val tGot = Sessionize
      .sessionPaths(tie, col("user_id"), col("ts"), 200L, col("event_id"), col("state"))
      .collect().map(r => r.getString(0)).toSeq
    assert(tGot === Seq("x>y"))
  }

  test("transitionCounts: hand-built streams, ppm exactness, self-transitions, lone events") {
    // user 1: a->b->b->c (ties resolved by event_id); user 2: a->c;
    // user 3: single event, contributes no transition
    val ev = Seq(
      (1L, 1L, 100L, "a"), (1L, 2L, 200L, "b"), (1L, 3L, 300L, "b"), (1L, 4L, 400L, "c"),
      (2L, 5L, 100L, "a"), (2L, 6L, 150L, "c"),
      (3L, 7L, 100L, "z")
    ).toDF("user_id", "event_id", "ts", "state")
    val got = Sessionize
      .transitionCounts(ev, col("user_id"), col("ts"), col("event_id"), col("state"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // departures from a: b (u1), c (u2) -> 500000 ppm each; from b: b, c
    assert(got === Set(
      ("a", "b", 1L, 500000L), ("a", "c", 1L, 500000L),
      ("b", "b", 1L, 500000L), ("b", "c", 1L, 500000L)))
  }

  test("transitionCounts: same-ts ties follow the tie-break; cross-user streams never mix") {
    val ev = Seq(
      (1L, 10L, 100L, "x"), (1L, 11L, 100L, "y"), // same ts: order by event_id
      (2L, 12L, 100L, "y"), (2L, 13L, 100L, "x")
    ).toDF("user_id", "event_id", "ts", "state")
    val got = Sessionize
      .transitionCounts(ev, col("user_id"), col("ts"), col("event_id"), col("state"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("x", "y", 1L), ("y", "x", 1L)))
  }

  test("transitionCounts: partitioning invariance and exact integer ppm on skewed fan-out") {
    val ev = (0 until 300).map { i =>
      (i.toLong % 5, i.toLong, i.toLong * 10, if (i % 3 == 0) "hot" else s"s${i % 7}")
    }.toDF("user_id", "event_id", "ts", "state")
    def run(p: Int) = Sessionize
      .transitionCounts(ev.repartition(p), col("user_id"), col("ts"), col("event_id"), col("state"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val a = run(1)
    assert(a === run(7) && a.nonEmpty)
    // every prev_state's ppm values sum to <= 1e6 with the deficit < fan-out
    val byPrev = a.groupBy(_._1)
    byPrev.foreach { case (_, rows) =>
      // toSeq first: mapping the SET through _._4 would dedup equal ppm
      // values (two 500000 rows collapse to one) and break the sum
      val ppmSum = rows.toSeq.map(_._4).sum
      assert(ppmSum <= 1000000L && ppmSum > 1000000L - rows.size)
    }
  }
}
