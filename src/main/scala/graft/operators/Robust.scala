package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median/MAD) per-group outlier statistics — the quality-control
  * screen a training-data pipeline runs over numeric telemetry before
  * trusting it (mean/stddev z-scores are themselves corrupted by the
  * outliers they're meant to find; the median absolute deviation is the
  * standard 50%-breakdown-point replacement — Hampel 1974, Leys et al.
  * 2013's |dev| > k·MAD rule).
  *
  * Determinism contract: exact linear-interpolation percentiles (Spark
  * `percentile` ≡ DuckDB `quantile_cont`, type-7 — parity pinned by q15),
  * and the outlier test compares `|v − med| · 10 > mad · 35` (k = 3.5 in
  * integer-scaled form): pure IEEE multiplies of identical doubles, no
  * division, no epsilon — both engines flag the identical row set.
  *
  * Scale posture (honest bound): exact `percentile` buffers each GROUP's
  * values on its reducer — correct whenever the group dimension is a
  * bounded domain (event types, sources, languages: the QC use case).
  * For open-domain groups or whole-corpus medians swap in
  * `percentile_approx` (t-digest, mergeable map-side sketches) or a
  * GlobalRank-style counting selection; the surrounding two-pass join
  * shape is unchanged. The med/MAD join back onto the events is a
  * broadcast (group-count rows, never data-sized).
  */
object Robust {

  /** Per-group median, MAD, and |dev| > (k10/10)·MAD outlier counts.
    *
    * @param k10 the MAD multiplier × 10 (35 = the conventional 3.5)
    * @return one row per group: key, med, mad (both rounded to 6 dp for
    *         the output contract — comparisons use the unrounded
    *         doubles), n_total, n_outliers
    */
  /** Winsorization audit: per-group exact [pLo, pHi] clip bounds and how
    * many rows each side would clip — the screen run BEFORE deciding to
    * winsorize a feature (all-integer counts; the bounds round to 6 dp
    * for the output contract while comparisons use the raw doubles, the
    * x48 discipline). Same two-pass broadcast-join shape and the same
    * honest per-group-percentile scale bound as [[madOutliers]].
    */
  def winsorBounds(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      pLo: Double = 0.05,
      pHi: Double = 0.95
  ): DataFrame = {
    val vals = df.select(keyCol.as("graft_key"), valueCol.as("v"))
    val bounds = vals
      .groupBy("graft_key")
      .agg(
        percentile(col("v"), lit(pLo)).as("lo"),
        percentile(col("v"), lit(pHi)).as("hi")
      )
    vals
      .join(broadcast(bounds), "graft_key")
      .groupBy("graft_key")
      .agg(
        round(min(col("lo")), 6).as("lo"),
        round(min(col("hi")), 6).as("hi"),
        count(when(col("v") < col("lo"), 1)).as("n_below"),
        count(when(col("v") > col("hi"), 1)).as("n_above"),
        count(lit(1)).as("n_total")
      )
  }

  /** Exact discrete per-group quantile by two-pass histogram refinement —
    * the open-domain scale path the [[madOutliers]]/[[winsorBounds]]
    * scaladoc names ("a GlobalRank-style counting selection"): NO reducer
    * ever buffers a group's values, so group count and group size are both
    * unbounded.
    *
    * Contract: the element at 0-based rank `(pNum·(n−1)) div pDenom` of
    * the group's values ascending (p = 1/2 → the lower median; DuckDB
    * `quantile_disc` semantics) — an exact data value, integer in, integer
    * out, no interpolation and nothing float-rendered.
    *
    * How the two passes bound state:
    *   1. histogram: `groupBy(key, v >> binShift).count` — a map-side-
    *      partial hash aggregation; one row per OCCUPIED bin per group
    *      crosses the exchange, never one per value.
    *   2. a window over that binned table (per group, by bin) finds each
    *      group's n, target rank, and the single bin whose cumulative
    *      count crosses the rank — plus the residual rank INSIDE that bin.
    *      The window's partitions are bin-table-sized, not data-sized.
    *   3. selection: rows are filtered to their group's target bin (the
    *      one-row-per-group bin frame broadcasts; open-domain groups would
    *      shuffle-join on (key, bin) — either way the surviving rows per
    *      group are one bin's worth, tunable by `binShift`), then a
    *      per-group sort of ONLY those rows picks the residual rank.
    *      Skewed bins (mega-duplicated values) concentrate —
    *      exactly like any selection — but equal values make the ANSWER
    *      rank-insensitive, so a production guard can short-circuit a bin
    *      whose min == max without sorting at all.
    *
    * @param pNum/pDenom the quantile as an exact rational (1/2, 95/100)
    * @param binShift    histogram bin width = 2^binShift value units
    * @return one row per group: key, n_total, target_rank (0-based),
    *         q_value — all integers
    */
  def binnedQuantileDisc(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      pNum: Long,
      pDenom: Long,
      binShift: Int
  ): DataFrame = {
    require(pNum >= 0 && pDenom > 0 && pNum <= pDenom, s"p must be in [0,1]: $pNum/$pDenom")
    val vals = df.select(keyCol.as("graft_key"), valueCol.cast("long").as("v"))
    val binned = vals
      .groupBy(col("graft_key"), shiftright(col("v"), binShift).as("bin"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("graft_key").orderBy("bin")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy("graft_key")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val target = binned
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n_total", sum(col("c")).over(wAll))
      .withColumn("target_rank", expr(s"$pNum * (n_total - 1) div $pDenom"))
      // the unique bin where the cumulative count first exceeds the rank
      .where(col("cum") > col("target_rank") && col("cum") - col("c") <= col("target_rank"))
      .select(
        col("graft_key"), col("bin"), col("n_total"), col("target_rank"),
        (col("target_rank") - (col("cum") - col("c"))).as("rank_in_bin"))
    val inBin = vals
      .join(broadcast(target), Seq("graft_key"))
      .where(shiftright(col("v"), binShift) === col("bin"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("graft_key").orderBy("v")
    inBin
      .withColumn("rn", row_number().over(rw) - 1)
      .where(col("rn") === col("rank_in_bin"))
      .select(col("graft_key"), col("n_total"), col("target_rank"), col("v").as("q_value"))
  }

  /** Burst screen over bucketed event counts — "which hours spiked" — the
    * robust anomaly flag per (key, time bucket), with the x48 median/MAD
    * rule made ALL-INTEGER so the driver hash never sees a float:
    * per-bucket counts are integers, so the median is a half-integer and
    * `med2 = 2·median` is exact in a BIGINT; deviations double likewise
    * (`dev2 = |2·n − med2|`), their median doubles to `mad4`, and the
    * k = 3.5 rule |n − med| > 3.5·MAD becomes the integer cross-multiply
    * `4·dev2 > 7·mad4`. Strict >, matching [[madOutliers]] (an all-equal
    * group has MAD 0 and flags only actual deviants).
    *
    * Scale: one (key, bucket) count aggregation; the med/MAD passes run
    * over the BUCKET table (bounded by key × time range, not event
    * count) and join back broadcast. For unbounded bucket domains the
    * [[binnedQuantileDisc]] histogram path swaps in, same shape.
    */
  def burstScreen(
      events: DataFrame,
      keyCol: Column,
      bucketCol: Column
  ): DataFrame = {
    val b = events
      .groupBy(keyCol.as("graft_key"), bucketCol.as("bucket"))
      .agg(count(lit(1)).as("n_events"))
    val med = b
      .groupBy("graft_key")
      .agg((percentile(col("n_events"), lit(0.5)) * 2).cast("long").as("med2"))
    val d = b
      .join(broadcast(med), "graft_key")
      .withColumn("dev2", abs(col("n_events") * 2 - col("med2")))
    val mad = d
      .groupBy("graft_key")
      .agg((percentile(col("dev2"), lit(0.5)) * 2).cast("long").as("mad4"))
    d
      .join(broadcast(mad), "graft_key")
      .select(
        col("graft_key"), col("bucket"), col("n_events"),
        (col("dev2") * 4 > col("mad4") * 7).as("is_burst"))
  }

  def madOutliers(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      k10: Int = 35
  ): DataFrame = {
    val vals = df.select(keyCol.as("graft_key"), valueCol.as("v"))
    val med = vals
      .groupBy("graft_key")
      .agg(percentile(col("v"), lit(0.5)).as("med"))
    val dev = vals.join(broadcast(med), "graft_key")
    val mad = dev
      .groupBy("graft_key")
      .agg(percentile(abs(col("v") - col("med")), lit(0.5)).as("mad"))
    dev
      .join(broadcast(mad), "graft_key")
      .groupBy("graft_key")
      .agg(
        round(min(col("med")), 6).as("med"),
        round(min(col("mad")), 6).as("mad"),
        count(lit(1)).as("n_total"),
        count(when(abs(col("v") - col("med")) * 10 > col("mad") * k10, 1)).as("n_outliers")
      )
  }

  /** Rank normalization to integer ppm — the distribution-free score
    * calibration curation pipelines apply before thresholding
    * heterogeneous quality signals (a perplexity, a rule count and a
    * classifier logit become comparable as ranks; thresholds like "drop
    * the bottom 10%" are then exact row counts, not distribution
    * guesses). rank_ppm = (rank − 1)·10⁶ div (n − 1): 0 for the minimum,
    * 10⁶ for the maximum, exact integers throughout (n = 1 maps to 0).
    *
    * `sort` must totalize the order (append a unique tie-break) — the
    * same contract, and the same two-phase range-partition machinery, as
    * [[GlobalRank.withGlobalRank]]: NO single-partition window anywhere,
    * and `n` is one driver scalar read from the already-persisted ranked
    * frame (max rank), not a second scan of the input.
    */
  def rankNormalizePpm(
      df: DataFrame,
      sort: Seq[Column],
      rankCol: String = "rank",
      outCol: String = "rank_ppm"
  ): DataFrame = {
    val ranked = GlobalRank.withGlobalRank(df, sort, rankCol)
    val nRow = ranked.agg(max(col(rankCol))).collect()(0)
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    val denom = math.max(n - 1L, 1L)
    ranked.withColumn(
      outCol,
      expr(s"CAST((($rankCol - 1) * 1000000) div $denom AS BIGINT)"))
  }
}
