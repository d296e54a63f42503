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
}
