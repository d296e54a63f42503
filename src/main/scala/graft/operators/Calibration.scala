package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-score calibration — the step between a trained scorer and
  * a usable quality signal: a curation stack that thresholds or weights
  * by classifier score (CCNet buckets, DSIR weights, x120's screen)
  * needs the score to MEAN something, and the standard tooling is the
  * reliability diagram (observed positive rate per score bin —
  * Niculescu-Mizil & Caruana 2005) followed by isotonic regression
  * (Zadrozny & Elkan 2002) when the diagram shows miscalibration.
  *
  * Everything is exact-integer (the repo ppm discipline):
  *   - bins are RANK-deciles of the score (equal-mass, the standard
  *     reliability binning; rank via the two-phase [[GlobalRank]] — no
  *     single-partition window);
  *   - per-bin rate = n_pos·10⁶ div n_docs;
  *   - the isotonic fit uses the MINIMAX characterization
  *     (Robertson-Wright-Dykstra: fit_i = max_{j≤i} min_{k≥i}
  *     rate(j..k)) over the ppm-quantized pooled rates — closed-form
  *     over bins³ combinations, no data-dependent PAVA merge loop, so a
  *     SQL engine replays it directly. The fit is monotone by
  *     construction and equals PAVA up to the ppm quantization of the
  *     pooled means.
  *
  * Scale shape: ONE corpus-sized stage (the rank partition + per-bin
  * aggregation, map-side combined); the bins table is a constant-size
  * frame (default 10 rows) under the bounded-driver-state contract, and
  * the minimax fit is O(bins³) driver arithmetic.
  */
object Calibration {

  /** Equal-mass reliability bins of a scored, binary-labeled frame.
    *
    * @param scored (idCol, scoreCol, labelCol) rows; label ∈ {+1, −1}
    * @return one row per bin: (bin, n_docs, n_pos, pos_ppm, min_score,
    *         max_score, mean_score), bin = (rank−1)·bins div n
    */
  /** Per-row equal-mass bin assignment: (id, score, y, bin). Shared by
    * the diagram, the fit, and the screen so the binning cannot drift.
    */
  private def binned(
      scored: DataFrame,
      bins: Int,
      idCol: String,
      scoreCol: String,
      labelCol: String
  ): DataFrame = {
    // persist BEFORE the count: the scorer chain upstream (a full
    // corpus classify for x138/x139/x142) would otherwise evaluate
    // twice — once for the count job, once for GlobalRank's range
    // shuffle. The count's scalar feeds the bin arithmetic as a
    // literal (the x137 moments-row posture).
    val base = scored.select(
      col(idCol).as("id"), col(scoreCol).as("score"), col(labelCol).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    require(n > 0L, "calibration over an empty frame (bin arithmetic would NULL)")
    GlobalRank
      .withGlobalRank(base, Seq(col("score"), col("id")))
      .withColumn("bin", expr(s"(rank - 1) * $bins div ${n}L"))
  }

  def reliabilityBins(
      scored: DataFrame,
      bins: Int = 10,
      idCol: String = "doc_id",
      scoreCol: String = "score",
      labelCol: String = "y"
  ): DataFrame = {
    binned(scored, bins, idCol, scoreCol, labelCol)
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"),
        min("score").as("min_score"),
        max("score").as("max_score"),
        sum("score").as("sum_score"))
      .select(
        col("bin"),
        col("n_docs"),
        col("n_pos"),
        expr("n_pos * 1000000L div n_docs").as("pos_ppm"),
        col("min_score"),
        col("max_score"),
        expr("sum_score div n_docs").as("mean_score"))
  }

  /** Isotonic fit over ordered (n_pos, n_docs) bins by the minimax
    * characterization: fit_i = max_{j ≤ i} min_{k ≥ i} pooled-ppm(j..k),
    * pooled-ppm(j..k) = (Σ n_pos)·10⁶ div (Σ n_docs). Pure integer
    * arithmetic over bins³ combinations; monotone non-decreasing by
    * construction. Exposed for the spec; no Spark.
    */
  private[graft] def isotonicFitPpm(binStats: Seq[(Long, Long)]): Seq[Long] = {
    val b = binStats.length
    val cumPos = binStats.scanLeft(0L)(_ + _._1).toArray
    val cumN = binStats.scanLeft(0L)(_ + _._2).toArray
    def rate(j: Int, k: Int): Long = {
      val docs = cumN(k + 1) - cumN(j)
      (cumPos(k + 1) - cumPos(j)) * 1000000L / math.max(docs, 1L)
    }
    (0 until b).map { i =>
      (0 to i).map(j => (i until b).map(k => rate(j, k)).min).max
    }
  }

  /** [[reliabilityBins]] + [[isotonicFitPpm]]: the calibration MAP —
    * per bin, the raw observed rate and the monotone isotonic rate a
    * downstream thresholder should use. The bins frame is
    * constant-size, so the collect is the bounded-state contract, and
    * the emitted frame is literal rows.
    */
  def isotonicCalibration(
      scored: DataFrame,
      bins: Int = 10,
      idCol: String = "doc_id",
      scoreCol: String = "score",
      labelCol: String = "y"
  ): DataFrame = {
    val spark = scored.sparkSession
    val rb = reliabilityBins(scored, bins, idCol, scoreCol, labelCol)
      .select("bin", "n_docs", "n_pos", "pos_ppm", "min_score", "max_score")
      .collect()
      .sortBy(_.getLong(0))
    val iso = isotonicFitPpm(rb.map(r => (r.getLong(2), r.getLong(1))).toSeq)
    import spark.implicits._
    rb.zip(iso).toSeq
      .map { case (r, f) =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), f,
          r.getLong(4), r.getLong(5))
      }
      .toDF("bin", "n_docs", "n_pos", "pos_ppm", "iso_ppm", "min_score", "max_score")
  }

  /** Fixed-width score-range bin (clamped to [0, bins−1]) — the
    * STREAM-STABLE binning: a pure per-row function of the score, so
    * per-bin counts are ADDITIVE across deliveries (rank-decile bins —
    * [[binned]] — shift as data arrives and cannot fold incrementally;
    * [[graft.streaming.CalibrationStream]] maintains exactly this bin's
    * counts). Integer arithmetic only: (score − lo)·bins div (hi − lo).
    */
  def fixedBin(score: Column, bins: Int, lo: Long, hi: Long): Column = {
    require(hi > lo, s"degenerate score range [$lo, $hi]")
    require(bins > 0, s"bins must be positive, got $bins")
    // Overflow posture (the Pca/Preference loud-overflow doctrine): the
    // score is CLAMPED into [lo, hi] before the multiply, so the widest
    // intermediate is (hi−lo)·bins — bounded here at construction time
    // to 2⁵³, the double-exactness ceiling of the division below (a
    // Long÷Long in Spark is a DOUBLE divide; the round-trip is exact
    // only while the numerator is exactly representable). Without the
    // clamp, an out-of-range score could wrap (non-ANSI Long
    // arithmetic) and mis-bin silently; with it, out-of-range scores
    // land on the edge bins, which is what the final clamp promised.
    require(
      (hi - lo) <= (1L << 53) / bins,
      s"(hi-lo)*bins exceeds the 2^53 exact-divide bound: " +
        s"range=${hi - lo}, bins=$bins")
    val clamped = least(greatest(score, lit(lo)), lit(hi))
    val raw = (clamped - lit(lo)) * lit(bins.toLong) / lit(hi - lo)
    least(greatest(raw.cast("long"), lit(0L)), lit(bins.toLong - 1L))
  }

  /** Per-fixed-bin (n_pos, n_docs) over a scored, labeled frame — ONE
    * corpus pass, map-side combined; shared by the streaming twin's
    * per-batch delta and the spec's batch comparator so the fold and
    * the batch path cannot drift.
    */
  def fixedBinStats(
      scored: DataFrame,
      bins: Int,
      lo: Long,
      hi: Long,
      scoreCol: String = "score",
      labelCol: String = "y"
  ): DataFrame =
    scored
      .select(
        fixedBin(col(scoreCol), bins, lo, hi).as("bin"),
        col(labelCol).as("y"))
      .groupBy("bin")
      .agg(
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"),
        count(lit(1)).as("n_docs"))

  /** The calibration USED: a per-document screen that keeps rows whose
    * CALIBRATED positive rate clears `minIsoPpm` — the threshold a
    * curation stack should apply instead of a raw-score cut (the raw
    * score's meaning varies across the range; the isotonic map is the
    * score → P(positive) contract, and thresholding it at p is
    * precision-targeting by construction). One corpus-sized rank pass,
    * the constant-size fit on the driver, then a bins-row broadcast
    * back onto the per-doc frame — the log/corpus never reshuffles for
    * the lookup.
    *
    * @return per row: (idCol, score, y, bin, iso_ppm, kept)
    */
  def calibratedScreen(
      scored: DataFrame,
      bins: Int = 10,
      minIsoPpm: Long = 500000L,
      idCol: String = "doc_id",
      scoreCol: String = "score",
      labelCol: String = "y"
  ): DataFrame = {
    val perDoc = binned(scored, bins, idCol, scoreCol, labelCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = perDoc
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"))
      .collect()
      .sortBy(_.getLong(0))
    val iso = isotonicFitPpm(stats.map(r => (r.getLong(2), r.getLong(1))).toSeq)
    val isoDf = {
      import scored.sparkSession.implicits._
      stats.map(_.getLong(0)).zip(iso).toSeq.toDF("bin", "iso_ppm")
    }
    perDoc
      .join(broadcast(isoDf), "bin")
      .select(
        col("id").as(idCol),
        col("score"), col("y"), col("bin"), col("iso_ppm"),
        (col("iso_ppm") >= minIsoPpm).as("kept"))
  }
}
