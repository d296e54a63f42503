package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference aggregation — the RLHF / preference-data staple.
  *
  * Reward-model and arena-style pipelines reduce millions of human (or
  * judge-model) A-vs-B comparisons to one scalar skill per item; the
  * canonical estimator is the Bradley-Terry model (Bradley & Terry 1952),
  * fitted by Hunter's MM iteration (Hunter 2004, "MM algorithms for
  * generalized Bradley-Terry models"):
  *
  *     w_i ← W_i / Σ_{j≠i} n_ij / (w_i + w_j)
  *
  * with W_i = total wins of i and n_ij = comparisons between i and j.
  * It is the scoring behind Chatbot-Arena-style leaderboards and the
  * preference-strength weighting step of RLHF data curation.
  *
  * Scale shape: the ONLY corpus-sized stages are the two groupBys that
  * collapse the raw comparison log to per-pair counts and per-item wins —
  * one keyed exchange each over the log, map-side combined, never re-read.
  * What they produce is bounded by the COMPETITOR set (models, policies,
  * prompt cohorts — dozens to thousands, so ≤ items² pair rows), which is
  * the same documented bounded-driver-state contract as the BPE merge
  * table, the k-means codebooks, and the CMS matrix: collect it, solve the
  * fixed-point on the driver in exact integer arithmetic, emit the
  * items-sized result. Distributing a ≤10⁶-row fixpoint across executors
  * would buy nothing and cost a broadcast-NLJ / single-partition shape per
  * round (the q27 lesson).
  *
  * Determinism: ratings are BIGINT fixed-point at `scale` (default 10⁶ —
  * the repo-wide ppm discipline). Each MM round computes
  *   t_ij    = n_ij·S² div max(w_i + w_j, 1)        (S-scaled n/(w_i+w_j))
  *   denom_i = Σ t_ij                               (exact BIGINT sum)
  *   raw_i   = W_i·S² div max(denom_i, 1)
  *   w_i     = raw_i div max(max_raw div S, 1)      (top item ≡ S)
  * The max-normalization replaces MM's geometric-mean constraint with an
  * overflow-free integer form (BT is scale-invariant, so any per-round
  * renormalization fits); every division is a truncating nonneg integer
  * div, so a SQL engine replays all rounds bit-for-bit (the
  * perceptron/LPA unrolled-oracle discipline). Bounds: t_ij = n_ij·S²
  * caps the PER-PAIR comparison count at 2⁶³/10¹² ≈ 9.2·10⁶ (and wins
  * per item likewise) — plenty for arena-scale logs, and GUARDED
  * loudly in [[btRatings]] (the oracle's BIGINT would error where
  * Scala would silently wrap, so an unguarded overflow would also be
  * an engine divergence); a log beyond the bound should pre-scale its
  * counts (BT is invariant to uniform count scaling).
  */
object Preference {

  /** Fit Bradley-Terry ratings over a comparison log.
    *
    * @param comparisons rows (item_a: long, item_b: long, winner: long)
    *                    with winner ∈ {item_a, item_b}; self-pairs are
    *                    dropped (they cancel in the MM update anyway).
    * @param rounds      fixed MM iterations (unrolled in the oracle)
    * @param scale       fixed-point scale of the emitted rating
    * @return one row per item: (item, n_comps, wins, rating, rank) with
    *         rank by (rating desc, item asc), ordered by item
    */
  def btRatings(
      comparisons: DataFrame,
      rounds: Int,
      scale: Long = 1000000L,
      maxPairs: Int = 10000000
  ): DataFrame = {
    val spark = comparisons.sparkSession
    val s2 = scale * scale
    val cmp = comparisons.where(col("item_a") =!= col("item_b"))
    // corpus-sized reductions; their results are items²- / items-bounded.
    // The bounded-driver-state contract gets a LOUD guard (the
    // Pca.covariance precedent): limit(maxPairs+1) makes the very collect
    // that would OOM the driver fail first — one extra row, zero extra jobs.
    val pairRows = cmp
      .select(
        least(col("item_a"), col("item_b")).as("i"),
        greatest(col("item_a"), col("item_b")).as("j"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"))
      .limit(maxPairs + 1)
      .collect()
    require(pairRows.length <= maxPairs,
      s"comparison log has > $maxPairs distinct (item_a, item_b) pairs — " +
        "beyond the driver-fixpoint contract (Preference scaladoc); use the " +
        "distributed MM formulation (btRatingsDistributed) or raise maxPairs " +
        "if driver memory genuinely allows")
    val pairs: Array[(Long, Long, Long)] =
      pairRows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wins: Map[Long, Long] = cmp
      .groupBy(col("winner").as("item"))
      .agg(count(lit(1)).as("wins"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap

    // the fixed-point headroom bound (scaladoc): n_ij·S² and wins·S²
    // must stay under 2⁶³ — fail loudly, never wrap (and never diverge
    // from the oracle's BIGINT, which errors instead of wrapping)
    val maxSafe = Long.MaxValue / s2
    pairs.foreach { case (i, j, nn) =>
      require(nn <= maxSafe,
        s"pair ($i, $j) has $nn comparisons > fixed-point headroom $maxSafe " +
          "at this scale; pre-scale the log's counts (BT is scale-invariant)")
    }
    wins.foreach { case (it, w) =>
      require(w <= maxSafe,
        s"item $it has $w wins > fixed-point headroom $maxSafe at this " +
          "scale; pre-scale the log's counts (BT is scale-invariant)")
    }

    val items: Array[Long] =
      pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val nComps: Map[Long, Long] = pairs
      .flatMap { case (i, j, n) => Seq(i -> n, j -> n) }
      .groupBy(_._1).map { case (it, xs) => it -> xs.map(_._2).sum }

    var w: Map[Long, Long] = items.map(_ -> scale).toMap
    for (_ <- 1 to rounds) {
      val denom = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((i, j, n) <- pairs) {
        val t = n * s2 / math.max(w(i) + w(j), 1L)
        // per-item denominator is an UNGUARDED sum of guarded terms: many
        // near-max-count pairs with collapsed rating sums (t ≈ n·S²) can
        // wrap the Long where the oracle's sum promotes to HUGEINT — fail
        // loudly, never silently diverge (the fixed-point doctrine)
        denom(i) = try Math.addExact(denom(i), t) catch {
          case _: ArithmeticException => throw new IllegalArgumentException(
            s"per-item MM denominator overflowed 2⁶³ at item $i; " +
              "pre-scale the log's counts (BT is scale-invariant)")
        }
        denom(j) = try Math.addExact(denom(j), t) catch {
          case _: ArithmeticException => throw new IllegalArgumentException(
            s"per-item MM denominator overflowed 2⁶³ at item $j; " +
              "pre-scale the log's counts (BT is scale-invariant)")
        }
      }
      val raw: Map[Long, Long] = items.map { it =>
        it -> wins.getOrElse(it, 0L) * s2 / math.max(denom(it), 1L)
      }.toMap
      val mx = if (raw.isEmpty) 0L else raw.values.max
      w = raw.map { case (it, v) => it -> v / math.max(mx / scale, 1L) }
    }

    val ranked: Map[Long, Long] = items
      .sortBy(it => (-w(it), it))
      .zipWithIndex.map { case (it, idx) => it -> (idx + 1L) }.toMap
    import spark.implicits._
    items.toSeq
      .map(it => (it, nComps(it), wins.getOrElse(it, 0L), w(it), ranked(it)))
      .toDF("item", "n_comps", "wins", "rating", "rank")
  }

  /** Distributed Bradley-Terry: the SAME fixed-point MM arithmetic as
    * [[btRatings]], with each round expressed as DataFrame joins — for
    * item sets beyond the driver-fixpoint contract (the
    * `Preference.scala` scaladoc's "distributing a ≤10⁶-row fixpoint
    * would buy nothing" note is a COHORT-scale ruling; this is the lift
    * for when the competitor set itself is corpus-sized: users as items,
    * prompts as items, pages dueling by engagement).
    *
    * Scale shape: the log collapses once to per-pair counts and per-item
    * wins (map-side combined, the only corpus-sized stages — identical
    * to the driver path); each MM round is then pairs ⋈ ratings (twice,
    * keyed on the item) → a t-orientation union agg → ratings-sized
    * frames only. Every round ends in a `localCheckpoint` (the PageRank
    * per-round posture: items-bounded materialization, lineage cut so
    * round r's plan never re-derives rounds 1..r−1) plus ONE scalar agg
    * for the max-normalization. No single-partition window anywhere —
    * the final rank uses the two-phase [[GlobalRank]].
    *
    * Overflow posture mirrors the driver path's loud guards: per-pair
    * n·S² and per-item wins·S² headroom are `require`d from one agg
    * pass; the per-item denominator is summed in DECIMAL(38,0) (exact,
    * the HUGEINT twin) and `require`d under 2⁶³ before casting back —
    * the silent Long wrap [[btRatings]]' addExact guards against cannot
    * occur here by construction.
    *
    * Output schema identical to [[btRatings]]; on any log within both
    * contracts the two fits are BIT-EQUAL (spec-pinned), because every
    * step is the same truncating integer arithmetic.
    */
  def btRatingsDistributed(
      comparisons: DataFrame,
      rounds: Int,
      scale: Long = 1000000L
  ): DataFrame = {
    val spark = comparisons.sparkSession
    val s2 = scale * scale
    val maxSafe = Long.MaxValue / s2
    val cmp = comparisons.where(col("item_a") =!= col("item_b"))
    // ONE corpus-side pass (r16, guide §1.2): the log collapses to
    // per-(pair, winner) counts ONCE; `pairs` and `wins` are both tiny
    // re-aggregations of the collapsed frame. The previous shape
    // evaluated the (typically corpus-sized) `cmp` subtree twice — once
    // for the pairs checkpoint, once for the wins side of the stats
    // checkpoint. Counts are unchanged (sum of per-winner counts per
    // pair ≡ the pair count; sum per winner ≡ the win count).
    val collapsed = cmp
      .select(
        least(col("item_a"), col("item_b")).as("i"),
        greatest(col("item_a"), col("item_b")).as("j"),
        col("winner"))
      .groupBy("i", "j", "winner")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val pairs = collapsed
      .groupBy("i", "j")
      .agg(sum(col("n")).as("n"))
      .localCheckpoint(false)
    // lazy checkpoint + ONE agg job materializes `pairs` AND yields both
    // the emptiness check and the per-pair headroom guard (previously
    // three driver jobs: eager checkpoint, isEmpty, max agg)
    val pairsHead = pairs.agg(count(lit(1)).as("c"), max(col("n")).as("m")).head
    if (pairsHead.getLong(0) == 0L) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("item", "n_comps", "wins", "rating", "rank")
    }
    val hr = pairsHead.getLong(1)
    require(hr <= maxSafe,
      s"a pair has $hr comparisons > fixed-point headroom $maxSafe at this " +
        "scale; pre-scale the log's counts (BT is scale-invariant)")
    val wins = collapsed
      .groupBy(col("winner").as("item"))
      .agg(sum(col("n")).as("wins"))
    // both (i, item) orientations from ONE evaluation of the pairs frame
    // (the connectedComponents bidir discipline) instead of a union that
    // evaluates the subtree twice
    val stats = pairs
      .select(
        explode(
          array(
            struct(col("i").as("item"), col("n")),
            struct(col("j").as("item"), col("n")))).as("e"))
      .select(col("e.item").as("item"), col("e.n").as("n"))
      .groupBy("item")
      .agg(sum(col("n")).as("n_comps"))
      .join(wins, Seq("item"), "left")
      .select(
        col("item"), col("n_comps"),
        coalesce(col("wins"), lit(0L)).as("wins"))
      .localCheckpoint(false)

    // the per-item headroom guard's agg job doubles as the stats
    // materialization (lazy checkpoint, §5 driver-job economy)
    val hw = stats.agg(max(col("wins"))).head.getLong(0)
    require(hw <= maxSafe,
      s"an item has $hw wins > fixed-point headroom $maxSafe at this " +
        "scale; pre-scale the log's counts (BT is scale-invariant)")

    var w = stats.select(col("item"), lit(scale).as("w"))
    for (_ <- 1 to rounds) {
      // both t-orientations from ONE evaluation of the pairs ⋈ w ⋈ w
      // round join (previously a unionAll re-ran the two joins)
      val t = pairs
        .join(w.select(col("item").as("i"), col("w").as("wi")), "i")
        .join(w.select(col("item").as("j"), col("w").as("wj")), "j")
        .select(
          col("i"), col("j"),
          expr(s"n * ${s2}L div greatest(wi + wj, 1L)").as("t"))
        .select(
          explode(
            array(
              struct(col("i").as("item"), col("t")),
              struct(col("j").as("item"), col("t")))).as("e"))
        .select(col("e.item").as("item"), col("e.t").as("t"))
      // exact DECIMAL(38,0) sum — the oracle's HUGEINT twin; a per-item
      // denominator past 2⁶³ fails loudly instead of wrapping. ONE job
      // per round (r16, the PageRank lazy-checkpoint posture): the raw
      // frame keeps denom_d next to w_raw, its lazy checkpoint is
      // materialized by a single agg that yields BOTH the overflow guard
      // and the max-normalization scalar; next round's `w` is a cheap
      // projection of the checkpointed leaf (previously 4 driver jobs
      // per round: denom checkpoint, overflow isEmpty, max agg, w
      // checkpoint).
      val raw = stats
        .join(
          t.groupBy("item")
            .agg(sum(col("t").cast("decimal(38,0)")).as("denom_d")),
          Seq("item"), "left")
        .select(
          col("item"),
          col("denom_d"),
          expr(s"wins * ${s2}L div greatest(CAST(coalesce(denom_d, 0) AS BIGINT), 1L)")
            .as("w_raw"))
        .localCheckpoint(false)
      val head = raw
        .agg(
          max(col("denom_d")).as("dmax"),
          max(col("w_raw")).as("mx"))
        .head
      require(
        head.isNullAt(0) ||
          head.getDecimal(0).compareTo(new java.math.BigDecimal(Long.MaxValue)) <= 0,
        "per-item MM denominator overflowed 2⁶³; pre-scale the log's " +
          "counts (BT is scale-invariant)")
      val mx = head.getLong(1)
      w = raw
        .select(
          col("item"),
          expr(s"w_raw div ${math.max(mx / scale, 1L)}L").as("w"))
    }

    GlobalRank
      .withGlobalRank(
        stats.join(w, "item"),
        Seq(negate(col("w")), col("item")))
      .select(
        col("item"), col("n_comps"), col("wins"),
        col("w").as("rating"), col("rank"))
  }

  /** Turn the fitted board back on its own log — preference-PAIR
    * curation, the step between comparison collection and DPO/reward
    * training (Rafailov et al. 2023 train on (chosen, rejected) pairs;
    * production filters drop pairs whose label the fitted model
    * contradicts or barely separates — likely annotation noise, and
    * noise in preference pairs poisons the loss like a mislabeled
    * positive does in contrastive mining). Per comparison: both sides'
    * ratings, the signed margin (chosen − rejected), `agree` (the
    * fitted model backs the observed winner), and `kept`
    * (margin ≥ minMargin — the curation gate).
    *
    * Scale shape: the ratings frame is items-bounded → both lookups are
    * broadcast joins; the log streams through map-side, one row out per
    * comparison, no shuffle of the log at all.
    *
    * @param comparisons (cmp_id, item_a, item_b, winner) rows
    * @param ratings     [[btRatings]] output (or any (item, rating))
    * @param minMargin   fixed-point keep threshold (same scale as ratings)
    */
  def curatedPairs(
      comparisons: DataFrame,
      ratings: DataFrame,
      minMargin: Long
  ): DataFrame = {
    val r = ratings.select(col("item"), col("rating"))
    comparisons
      .where(col("item_a") =!= col("item_b"))
      .withColumn(
        "rejected",
        when(col("winner") === col("item_a"), col("item_b"))
          .otherwise(col("item_a")))
      .join(
        broadcast(r.select(col("item").as("winner"), col("rating").as("chosen_rating"))),
        "winner")
      .join(
        broadcast(r.select(col("item").as("rejected"), col("rating").as("rejected_rating"))),
        "rejected")
      .select(
        col("cmp_id"),
        col("winner").as("chosen"),
        col("rejected"),
        col("chosen_rating"),
        col("rejected_rating"),
        (col("chosen_rating") - col("rejected_rating")).as("margin"),
        (col("chosen_rating") - col("rejected_rating") > 0L).as("agree"),
        (col("chosen_rating") - col("rejected_rating") >= minMargin).as("kept"))
  }
}
