package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** KMV (k-minimum-values) distinct-count estimation — the sketch a
  * pipeline reaches for when exact `count(distinct x)` per group would
  * shuffle one row per distinct value (distinct users per event, distinct
  * URLs per host, vocabulary per shard) and an approximate answer with a
  * bounded-error guarantee is enough.
  *
  * Estimator (Bar-Yossef et al., "Counting distinct elements in a data
  * stream"): hash every element uniformly into [0, 2^40); keep the k
  * smallest DISTINCT hashes per group; if fewer than k exist the count is
  * EXACT (the sketch holds every value), otherwise
  * est = (k-1) · 2^40 / h_(k) — the k-th minimum's position estimates the
  * density. Relative error ~ 1/sqrt(k).
  *
  * Scale design (100 TB posture):
  *   - ONE shuffle: the [[graft.functions.KmvMins]] aggregate runs
  *     map-side partials, so O(k) longs per group per partition cross the
  *     exchange — never a row per distinct element. Exact
  *     `count(distinct)`'s expand-then-regroup ships every distinct
  *     (group, value) pair; at web scale (billions of users × events)
  *     that exchange dominates the job, while the sketch's is flat in
  *     cardinality.
  *   - Deterministic and engine-portable: the randomness lives entirely
  *     in the md5-derived hash, so the sketch is a pure function of the
  *     data — reproducible across runs, partitionings, and engines, and
  *     oracle-able bit-for-bit (the x57 DuckDB oracle replays hash,
  *     k-minima and estimate exactly). Production swaps in xxhash64 for
  *     speed with the sketch unchanged (the x15 md5-sampling precedent).
  *   - All-integer output contract: the estimate is integer division on
  *     BIGINTs (no float rendering in the driver hash).
  */
object DistinctSketch {

  /** Hex chars of the md5 prefix used as the hash value: 10 → 40 bits,
    * exact in doubles AND small enough that (k-1)·2^40 never overflows a
    * BIGINT for any sane k.
    */
  val HexChars = 10

  /** Size of the hash domain, 2^40. */
  val Domain: Long = 1L << (4 * HexChars)

  /** Uniform 40-bit hash of any column: md5 of its canonical string
    * rendering, first [[HexChars]] hex digits as an integer.
    */
  def hash40(elem: Column): Column =
    conv(substring(md5(elem.cast("string")), 1, HexChars), 16, 10).cast("long")

  /** Scala twin of [[hash40]] for typed/streaming code paths (the
    * [[graft.streaming.DistinctStream]] state fold): first 5 md5 bytes =
    * first 10 hex digits. SketchSpec pins the two forms equal, so a batch
    * sketch and a streaming sketch over the same data always agree.
    */
  // MessageDigest.getInstance is a provider lookup + allocation; this is
  // the engine's hottest scalar (every hashed feature of every document
  // on the classifier/trainer paths routes through it), so the instance
  // is thread-local and reused — digest() resets it after each call.
  // Output is bit-identical; SketchSpec pins hash40Scala ≡ the column
  // hash40 (guide §1.2 step 2: per-task work).
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash40Scala(s: String): Long = {
    val d = md5Local.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
      ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
  }

  /** Per-group KMV distinct estimate of `elem`.
    *
    * Output: groupCols ++ (n_tracked, kth_hash, est_distinct) —
    * `n_tracked` = min(k, observed distinct hashes); `kth_hash` = the
    * k-th minimum (NULL while the count is exact); `est_distinct` = the
    * exact count below k, else (k-1)·2^40 div kth. NULL elements are
    * ignored, matching `count(distinct)`.
    */
  def kmvDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      elem: Column,
      k: Int
  ): DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    val gs = groupCols.map(col)
    val num = (k - 1).toLong * Domain
    df.select(gs :+ hash40(elem).as("kmv_h"): _*)
      .groupBy(gs: _*)
      .agg(GraftFunctions.kmvMins(col("kmv_h"), k).as("kmv_mins"))
      .select(
        gs ++ Seq(
          size(col("kmv_mins")).cast("long").as("n_tracked"),
          when(size(col("kmv_mins")) === k, element_at(col("kmv_mins"), k))
            .as("kth_hash"),
          when(size(col("kmv_mins")) < k, size(col("kmv_mins")).cast("long"))
            // greatest(…, 1): a literal-zero k-th minimum (md5 prefix
            // 0000000000, p = 2^-40 per group) must degrade to a huge
            // estimate, not divide by zero under the driver's ANSI mode
            .otherwise(
              expr(
                s"CAST($num AS BIGINT) div greatest(element_at(kmv_mins, $k), CAST(1 AS BIGINT))"))
            .as("est_distinct")
        ): _*
      )
  }

  /** Per-group HyperLogLog distinct estimate of string `elem` — the
    * constant-64-byte-state companion to [[kmvDistinct]]: KMV when small
    * counts must be exact, HLL when sketches must union cheaply across
    * shards/days (elementwise max). See
    * [[graft.functions.HllRegisters]] for the register contract.
    *
    * Output per group: (r_max, s_scaled, n_zero_regs, est_distinct) with
    * the EXACT-INTEGER raw estimator est = α_ppm·m²·2^R div (10⁶·S),
    * α_ppm = 709265 (α₆₄ = 0.7213/(1 + 1.079/64) to ppm), m = 64,
    * R = max register, S = Σ_j 2^(R−M_j) — every quantity a BIGINT, so
    * DuckDB replays registers AND estimate bit-for-bit. Raw-regime only
    * (no small/large-range correction — needs ln; n_zero_regs lets
    * callers detect the small regime and fall back to KMV).
    *
    * Plan shape: ONE exchange (the register aggregate, 64 bytes per
    * group×partition partial); the register file then explodes into a
    * BOUNDED 64-row frame per group — the max-over-group window below
    * runs on that 64-row frame (the x22 bounded-window argument), never
    * on data rows.
    */
  def hllDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      elem: Column
  ): DataFrame = {
    val gs = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*)
    df.select(gs :+ elem.as("hll_e"): _*)
      .groupBy(gs: _*)
      .agg(GraftFunctions.hllRegisters(col("hll_e")).as("regs"))
      .select(gs :+ explode(col("regs")).as("mj"): _*)
      .withColumn("r_max", max(col("mj")).over(w))
      .groupBy(gs: _*)
      .agg(
        max(col("mj")).as("r_max"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), r_max - mj)")).as("s_scaled"),
        sum(when(col("mj") === 0, 1L).otherwise(0L)).as("n_zero_regs"))
      .withColumn(
        "est_distinct",
        // BIGINT from the first factor: 709265·4096 overflows INT32, and
        // the driver's ANSI session would throw where non-ANSI wraps
        expr("(CAST(709265 AS BIGINT) * 4096 * shiftleft(CAST(1 AS BIGINT), r_max))" +
          " div (CAST(1000000 AS BIGINT) * s_scaled)"))
  }
}
