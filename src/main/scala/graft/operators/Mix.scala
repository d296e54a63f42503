package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Token-budget corpus mixing — the "data mixing" verb of training-set
  * assembly: from each source (language, domain, crawl), keep a
  * deterministic, reproducible subset of documents whose token counts fill
  * that source's budget, so the mixed corpus hits a target token
  * distribution regardless of how skewed the raw source sizes are.
  * (The reference pipeline has no analogue; this is a north-star extension
  * like x15's deterministic sampling, which it composes with: hash-order
  * selection means adding documents to a source never un-selects
  * previously kept ones below the budget frontier.)
  *
  * The selection rule is the standard greedy fill: order each source's
  * documents by a content hash (deterministic, uniform, reproducible —
  * no RNG state), and keep documents while the INCLUSIVE running token
  * sum stays within budget. Computing that running sum naively is the
  * same scale trap q27 had: `Window.partitionBy(source).orderBy(hash)`
  * serializes each source through ONE task — and sources are few and
  * huge in exactly the mixing use case (a 100 TB corpus might have 30
  * languages; the English partition would be tens of TB through one
  * reducer). This operator generalizes [[GlobalRank]]'s two-phase shape
  * from row_number to an arbitrary weighted running sum:
  *
  *   1. `repartitionByRange` on (source, hash, tiebreak) — each partition
  *      holds a contiguous slice of each source's hash order, partitions
  *      sort in parallel;
  *   2. one tiny per-(partition, source) sum — at most P + S − 1 rows to
  *      the driver (each of the P range partitions holds a contiguous run
  *      of ≥1 source slices; bounded by parallelism + source count, not
  *      data size), whose per-source running sum is each slice's offset;
  *   3. a PARTITION-LOCAL running sum (ROWS frame over the same total
  *      order) plus the broadcast offset.
  *
  * Offsets come from actual slice sums, so results are exact and
  * deterministic for any boundary placement the range sampler picks —
  * sampling skew can unbalance task times, never values.
  */
object Mix {

  /** `df` plus an `outCol` LONG column holding the inclusive running sum
    * of `weight` within each `source` group, over the total order
    * (source, sort...). `sort` MUST complete a total order within every
    * source (include a unique tie-break key): slices are glued end-to-end
    * by offsets, so cross-boundary ties would otherwise make the local
    * ROWS frame disagree with a global one. Weight values are cast to
    * LONG; the frame is persisted because the range shuffle feeds both
    * the offset job and the caller's plan.
    */
  def withSourceCumSum(
      df: DataFrame,
      source: Column,
      sort: Seq[Column],
      weight: Column,
      outCol: String = "cum_weight",
      numPartitions: Int = 0
  ): DataFrame = {
    val s = df.sparkSession
    val p = if (numPartitions > 0) numPartitions else s.sparkContext.defaultParallelism
    // __src is canonicalized to a non-null STRING: the slice-sum collect
    // reads it with getString and sorts by it, so a non-string source
    // column (e.g. an integer domain id) must be cast, and a NULL source
    // must not NPE the sort or fall out of the offsets equi-join. NULLs
    // group under a NUL sentinel (collision with a real one-char NUL
    // source value is accepted and documented).
    val srcStr = when(source.isNull, lit("\u0000")).otherwise(source.cast("string"))
    val keyed = df.withColumn("__src", srcStr).withColumn("__w", weight.cast("long"))
    val ranged = keyed
      .repartitionByRange(p, col("__src") +: sort: _*)
      .withColumn("__part", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val slices = ranged
      .groupBy(col("__part"), col("__src"))
      .agg(sum(col("__w")).as("__s"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1)) // per source, in partition (= range) order
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var curSrc: String = null
    var acc = 0L
    slices.foreach { case (part, src, sliceSum) =>
      if (src != curSrc) { curSrc = src; acc = 0L }
      offsets += ((part, src, acc))
      acc += sliceSum
    }
    val offDf = s.createDataFrame(offsets.toIndexedSeq).toDF("__part", "__src", "__offset")
    val w = Window
      .partitionBy(col("__part"), col("__src"))
      .orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offDf), Seq("__part", "__src"))
      .withColumn(outCol, sum(col("__w")).over(w) + col("__offset"))
      .drop("__part", "__src", "__w", "__offset")
  }

  /** Deterministic token-balanced CONTIGUOUS sharding — the "write the
    * training shards" verb: order the corpus by a content hash (the same
    * no-RNG determinism contract as x15 sampling / [[tokenBudgetFill]])
    * and cut it into `numShards` contiguous runs of near-equal TOKEN mass
    * (not document count — documents vary 100× in length, so count-equal
    * shards are token-skewed and the slowest trainer data-loader gates
    * every step). A document starting at token offset `o` (exclusive
    * prefix sum) lands in shard `o·S div total` — the boundaries every
    * engine agrees on, since offsets and totals are exact BIGINTs. Each
    * shard's token mass deviates from total/S by at most one document, no
    * shard is ever empty-by-construction unless documents outnumber
    * tokens, and the assignment is reproducible from the data alone.
    *
    * Scale shape: the running sum is [[withSourceCumSum]]'s two-phase
    * range-partition form (NO single-partition window — the q27/x36
    * lesson), and `total` is ONE driver scalar (max of the inclusive
    * cumsum — read from the already-persisted ranged frame, not a second
    * scan of the input). `sort` must complete a total order.
    */
  def tokenShards(
      df: DataFrame,
      sort: Seq[Column],
      weight: Column,
      numShards: Int,
      cumCol: String = "cum_tok",
      shardCol: String = "shard"
  ): DataFrame = {
    require(numShards >= 1, "need at least one shard")
    val withCum = withSourceCumSum(df, lit("all"), sort, weight, cumCol)
    val totalRow = withCum.agg(max(col(cumCol))).collect()(0)
    val total = if (totalRow.isNullAt(0) || totalRow.getLong(0) <= 0L) 1L else totalRow.getLong(0)
    withCum
      .withColumn("__start", col(cumCol) - weight.cast("long"))
      .withColumn(
        shardCol,
        expr(s"cast(least($numShards - 1, __start * $numShards div $total) as int)")
      )
      .drop("__start")
  }

  /** Greedy budget fill: keep each source's documents in `hash`-order
    * while the inclusive running `weight` sum stays ≤ that source's
    * budget (sources absent from `budgets` use `defaultBudget`). Never
    * overshoots; a document larger than the remaining budget is skipped
    * ONLY if it is past the frontier — the rule is the pure prefix cut,
    * so membership is stable under corpus growth (a new document can
    * only push others out by hashing earlier, exactly like x15's
    * md5-bucket sampling).
    */
  def tokenBudgetFill(
      df: DataFrame,
      source: Column,
      sort: Seq[Column],
      weight: Column,
      budgets: Map[String, Long],
      defaultBudget: Long,
      cumCol: String = "cum_tok"
  ): DataFrame = {
    val withCum = withSourceCumSum(df, source, sort, weight, cumCol)
    val budgetCol = budgets.foldLeft(lit(defaultBudget)) { case (acc, (src, b)) =>
      when(source === lit(src), lit(b)).otherwise(acc)
    }
    withCum.where(col(cumCol) <= budgetCol)
  }

  /** Rendezvous (highest-random-weight) shard assignment — the STABLE
    * sharding verb for incrementally rebuilt corpora (Thaler & Ravishankar
    * 1998): each key scores every shard with an independent hash and goes
    * to the argmax. Unlike `hash(key) mod n`, growing n → n+1 moves ONLY
    * the keys whose new shard's weight wins — an expected 1/(n+1) of the
    * corpus — so an incremental re-shard rewrites one new shard's worth of
    * data instead of reshuffling everything (the same stability argument
    * as x15's nested hash sampling, applied to placement).
    *
    * Map-only: n md5 hashes per row inside one codegen'd projection, no
    * shuffle, no shard directory to coordinate. Deterministic and
    * engine-portable via the standard [[DistinctSketch.hash40]]; ties
    * (p ≈ n·2⁻⁴⁰ per key) break to the lowest shard via first-position
    * argmax.
    *
    * @return df plus `shard` (int in [0, n)) and `shard_weight` (the
    *         winning 40-bit hash, BIGINT — the replayable evidence)
    */
  def rendezvousShard(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    val weights = transform(
      sequence(lit(0), lit(nShards - 1)),
      s => DistinctSketch.hash40(concat(key.cast("string"), lit(":"), s.cast("string"))))
    df.withColumn("hrw_w", weights)
      .withColumn("shard",
        (array_position(col("hrw_w"), array_max(col("hrw_w"))) - 1).cast("int"))
      .withColumn("shard_weight", array_max(col("hrw_w")))
      .drop("hrw_w")
  }

  /** Temperature-scaled domain mixing quotas (T = 2): the
    * Gopher/PaLM-style rebalancing that down-weights over-represented
    * sources by sampling each source proportionally to
    * `tokens^(1/T) = √tokens` instead of raw token share — big crawls
    * shrink, small curated sources grow, nothing disappears. This is the
    * PLANNING surface (the x58 audit-first posture): one row per source
    * with raw share, temperature weight, quota, and the keep-rate that
    * [[Sampling.deterministicSample]] then enforces doc-level; a pipeline
    * owner reads the table before committing to the cut.
    *
    * All-integer contract: √ is the EXACT integer square root —
    * `floor(sqrt(double))` then a ±1 integer correction so
    * `r² ≤ x < (r+1)²` holds exactly (the double seed is within ±1 of
    * isqrt for x < 2⁵²; the correction makes the result engine-exact
    * regardless of sqrt rounding). Shares and quotas are ppm by integer
    * division; the keep rate is `quota_ppm·10⁶ div share_ppm`, capped at
    * 10⁶ (sources under their quota keep everything — this planner only
    * shrinks, it does not upsample).
    *
    * 100 TB shape: ONE map-side-partial aggregation over the corpus
    * (source → token total); everything after runs on the source table —
    * bounded by the domain count, the same bounded-driver-state contract
    * as the IVF centroids. Σw is collected and inlined as a literal per
    * the no-NLJ scalar rule.
    */
  /** UniMax language balancing (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): spread a total token budget UNIFORMLY across
    * languages, except that no language may exceed `epochCap` epochs of
    * its available tokens — the waterfill whose level rises until the
    * budget is spent, with small languages saturating at their cap.
    * The published alternative to [[temperatureQuotas]]' power-law
    * smoothing: temperature still oversamples the head; UniMax is flat
    * above the cap.
    *
    * Exact integer formulation (sorted by (cap, lang); all Long):
    * language j (1-based, L total, prefix sums S) is SATURATED iff
    * `cap_j · (L − j + 1) ≤ budget − S_{j−1}` — by the standard
    * exchange argument the saturated set is a PREFIX (if j fails, j+1
    * fails: B − S_j < cap_j·(L−j) ≤ cap_{j+1}·(L−j)), so the per-row
    * predicate, the sequential greedy, and the real-valued waterfill
    * all pick the same set. Unsaturated languages split the remainder
    * `R` as `R div k` each, the first `R mod k` in sort order getting
    * one extra token — quotas sum to exactly `min(budget, Σcap)`.
    *
    * Scale posture: ONE map-side-partial aggregation over the corpus;
    * the waterfill itself runs on the per-language table — bounded by
    * the number of LANGUAGES (~hundreds), collected as driver state
    * under the ivfCentroids/BPE bounded-scalar contract and computed in
    * plain Scala rather than through a single-partition window.
    *
    * Output per language: `n_tok`, `cap`, `quota`, `keep_ppm`
    * (quota·10⁶ div n_tok — >10⁶ means multiple epochs, capped at
    * `epochCap`·10⁶), `saturated`.
    */
  def unimaxQuotas(
      docs: DataFrame,
      group: Column,
      tokenCount: Column,
      budget: Long,
      epochCap: Long
  ): DataFrame = {
    require(budget >= 0 && epochCap >= 1, s"budget=$budget epochCap=$epochCap")
    val s = docs.sparkSession
    // canonicalize the group key the way withSourceCumSum does: a
    // non-string column (e.g. an integer domain id) must be cast before
    // getString, and a NULL group would NPE the (cap, lang) sortBy —
    // sentinel it as NUL (collision with a real one-char NUL string is
    // acceptable for corpus group labels)
    val langStr = when(group.isNull, lit("\u0000")).otherwise(group.cast("string"))
    val perLang = docs
      .groupBy(langStr.as("lang"))
      .agg(sum(tokenCount.cast("long")).as("n_tok"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val caps = perLang
      .map { case (l, n) => (l, n, n * epochCap) }
      .sortBy { case (l, _, c) => (c, l) }
    val L = caps.length
    var rem = budget
    var slots = L
    val sat = Array.fill(L)(false)
    var i = 0
    while (i < L && slots > 0 && caps(i)._3 * slots <= rem) {
      sat(i) = true; rem -= caps(i)._3; slots -= 1; i += 1
    }
    val base = if (slots > 0) rem / slots else 0L
    val extra = if (slots > 0) rem % slots else 0L
    var u = 0
    val rows = caps.zipWithIndex.map { case ((l, n, c), idx) =>
      val q =
        if (sat(idx)) c
        else { val r = base + (if (u < extra) 1L else 0L); u += 1; r }
      (l, n, c, q, if (n > 0) q * 1000000L / n else 0L, sat(idx))
    }
    s.createDataFrame(rows.toIndexedSeq)
      .toDF("lang", "n_tok", "cap", "quota", "keep_ppm", "saturated")
  }

  def temperatureQuotas(
      docs: DataFrame,
      group: Column,
      tokenCount: Column
  ): DataFrame = {
    val perSource = docs
      .groupBy(group.as("source"))
      .agg(sum(tokenCount.cast("long")).as("n_tokens"))
      .localCheckpoint()
    val isqrt = {
      val r0 = floor(sqrt(col("n_tokens").cast("double"))).cast("long")
      when((r0 + 1) * (r0 + 1) <= col("n_tokens"), r0 + 1)
        .when(r0 * r0 > col("n_tokens"), r0 - 1)
        .otherwise(r0)
    }
    val weighted = perSource.withColumn("weight", isqrt).localCheckpoint()
    // two bounded scalars (total tokens, total weight) — driver literals
    val totals = weighted
      .agg(sum(col("n_tokens")), sum(col("weight")))
      .head()
    val totTok = math.max(if (totals.isNullAt(0)) 0L else totals.getLong(0), 1L)
    val totW = math.max(if (totals.isNullAt(1)) 0L else totals.getLong(1), 1L)
    weighted
      .withColumn("share_ppm", expr(s"n_tokens * 1000000L div ${totTok}L"))
      .withColumn("quota_ppm", expr(s"weight * 1000000L div ${totW}L"))
      .withColumn(
        "keep_rate_ppm",
        when(col("share_ppm") > 0,
          least(expr("quota_ppm * 1000000L div share_ppm"), lit(1000000L)))
          .otherwise(lit(1000000L)))
  }
}
