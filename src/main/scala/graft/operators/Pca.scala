package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Principal-component extraction over an embedding corpus — the
  * dimensionality step in front of every serious vector index:
  * PCA/whitening rotations precede IVF and PQ training (OPQ — Ge et al.
  * 2013 — is PQ after exactly such a learned rotation), SemDeDup-style
  * clustering runs on reduced vectors, and the top component alone is
  * the classic "dominant direction" diagnostic (anisotropy removal,
  * Mu & Viswanath 2018).
  *
  * Engine-replayable by construction (the x91 integer discipline): the
  * corpus is quantized q = ⌊v·10³⌋ (the plane-grid convention), second
  * moments come from ONE [[graft.functions.IntGram]] pass (n, Σq,
  * Σqqᵀ — exact BIGINT, order-independent), the n²-scaled covariance
  * C = n·Σqqᵀ − (Σq)(Σq)ᵀ never divides, and the power iteration runs
  * fixed rounds of integer matrix-vector products with truncating-div
  * renormalization — every step a SQL engine replays bit-for-bit.
  *
  * Scale shape: ONE corpus pass for the moments (map-side combined —
  * the exchange carries one (n, s[dim], g[dim(dim+1)/2]) triple per
  * partition) over the TRAINING SAMPLE (`trainMod` — rotation trainers
  * sample, the x118 codebook posture; covariance estimates converge in
  * O(dim) samples, not O(corpus)), the dim²-bounded eigen solve on the
  * driver (codebook contract), then one map-only projection pass over
  * the full corpus with the component inlined as literals (the
  * perceptron weight-literal discipline — no join, no second shuffle).
  *
  * Fixed-point arithmetic, shared with the oracle. Plain power
  * iteration is the WRONG algorithm here: a near-isotropic corpus has
  * λ₂/λ₁ ≈ 0.98 (measured on the gate corpus at bench scale), so x·Cʳ
  * needs hundreds of un-unrollable rounds. Instead the dim²-bounded
  * matrix is SQUARED s times — C^(2ˢ) reaches effective power 1024 at
  * s = 10, alignment error (λ₂/λ₁)^1024 ≈ 10⁻⁸ — with a truncating
  * renormalization per squaring for overflow headroom:
  *   M₀ = C div max(max|C| div 10⁸, 1)
  *   Mᵣ = (Mᵣ₋₁·Mᵣ₋₁) div max(max|Mᵣ₋₁·Mᵣ₋₁| div 10⁸, 1)
  *   x  = Mₛ·1  div max(max|Mₛ·1| div 10⁶, 1)
  * (64·10⁸·10⁸ < 2⁶³ bounds every product-sum.) All divisions truncate
  * toward zero (Scala `/`, Spark `div`, DuckDB `//` agree). Covariance
  * is PSD, so squaring preserves the dominant direction; degenerate
  * (all-zero) corpora stay deterministic on both engines.
  */
object Pca {

  /** The quantized-vector column (shared with the oracle's vq CTE). */
  private def quantize(vecCol: String): Column =
    transform(col(vecCol), x => floor(x.cast("double") * 1000).cast("long"))

  /** Truncating elementwise renormalization to max|entry| ≤ target. */
  private def rescale(a: Array[Array[Long]], target: Long): Array[Array[Long]] = {
    val maxAbs = a.iterator.flatten.foldLeft(0L)((m, v) => math.max(m, math.abs(v)))
    val div = math.max(maxAbs / target, 1L)
    a.map(_.map(_ / div))
  }

  /** The n²-scaled integer covariance from a moment triple. The n·g
    * and s·s products carry an extra factor of n over IntGram's own
    * bound: with the engine-standard 10³ quantization they stay under
    * 2⁶³ only for n ≤ ~3·10⁶ training rows — fail loudly, never wrap
    * (covariance trainers SAMPLE; pass a larger trainMod, the x118
    * codebook posture — O(dim) samples estimate the rotation).
    */
  private def covariance(n: Long, s: Array[Long], gUpper: Array[Long]): Array[Array[Long]] = {
    require(n <= 3000000L,
      s"covariance over $n training rows risks 2⁶³ overflow in n·Σqqᵀ " +
        "(the bound is ~3e6 at the 10³ quantization); sample the trainer " +
        "with a larger trainMod — rotations converge in O(dim) samples")
    // the n-bound above assumes |q| ≤ ~10³ (unit-range embeddings at the
    // 10³ quantization) but quantize() does not clamp — out-of-range
    // vectors could wrap n·g or sᵢ·sⱼ without tripping it. Exact
    // arithmetic closes the hole: fail loudly, never wrap (the oracle's
    // HUGEINT would keep going where Long cannot — a silent-wrap here is
    // an engine divergence, the Preference doctrine).
    val dim = s.length
    val c = Array.ofDim[Long](dim, dim)
    var k = 0
    try {
      for (i <- 0 until dim; j <- i until dim) {
        val v = Math.subtractExact(
          Math.multiplyExact(n, gUpper(k)),
          Math.multiplyExact(s(i), s(j)))
        c(i)(j) = v
        c(j)(i) = v
        k += 1
      }
    } catch {
      case _: ArithmeticException => throw new IllegalArgumentException(
        "n·Σqqᵀ − (Σq)(Σq)ᵀ overflowed 2⁶³ — embeddings outside the " +
          "assumed [-1,1] range at the 10³ quantization (or an extreme " +
          "sample); rescale the vectors or sample with a larger trainMod")
    }
    c
  }

  /** One matrix-squaring solve: rescale → `squarings` squarings → M·1 →
    * fixed-point normalization. Pure integer arithmetic.
    */
  private def solveDominant(c: Array[Array[Long]], squarings: Int): Array[Long] = {
    val dim = c.length
    var m = rescale(c, 100000000L)
    for (_ <- 1 to squarings) {
      val sq = Array.tabulate(dim, dim)((i, j) =>
        (0 until dim).map(t => m(i)(t) * m(t)(j)).sum)
      m = rescale(sq, 100000000L)
    }
    val y = m.map(_.sum) // Mₛ·1
    val div = math.max(y.foldLeft(0L)((mx, v) => math.max(mx, math.abs(v))) / 1000000L, 1L)
    y.map(_ / div)
  }

  /** Fixed-point matrix-squaring power method over the n²-scaled integer
    * covariance; returns the dominant component as fixed-point longs
    * after `squarings` squarings (effective power 2^squarings). Exposed
    * for the spec; pure integer arithmetic, no Spark.
    */
  private[graft] def powerIterate(
      n: Long,
      s: Array[Long],
      gUpper: Array[Long],
      squarings: Int
  ): Array[Long] =
    solveDominant(covariance(n, s, gUpper), squarings)

  /** Top `r` components by solve-then-DEFLATE (Hotelling): after each
    * dominant solve, subtract the component's spectral share
    *
    *   C ← C − d,   d_ij = (t₁·x_i·x_j) div xᵀx,  t₁ = xᵀCx div xᵀx
    *
    * — the rank-one update λvvᵀ in pure truncating integer arithmetic
    * (ONE final division per entry, so the truncation error is ±1 on
    * the covariance scale; xᵀCx and t₁·x_i·x_j overflow 2⁶³ and ride
    * int128 — Scala BigInt here, HUGEINT in the oracle, identical
    * trunc-toward-zero semantics). The deflated solve re-enters the
    * same rescale, so residual drift never compounds past the 10⁸
    * headroom. Exposed for the spec; pure integer arithmetic, no Spark.
    */
  private[graft] def topComponents(
      n: Long,
      s: Array[Long],
      gUpper: Array[Long],
      r: Int,
      squarings: Int
  ): Seq[Array[Long]] =
    componentChain(n, s, gUpper, r, squarings)._1

  /** The solve-then-deflate chain WITH its spectral accounting: the
    * components, each component's spectral share t1 = xᵀCx div xᵀx on
    * the rescaled-covariance scale (the deflation's own eigenvalue
    * estimate — clamped at 0 for reporting: a deflated residual's
    * truncation noise can dip epsilon-negative, and a variance share is
    * nonnegative by meaning), and the rescaled covariance's trace (the
    * total variance on the same scale, ≥ 1). Pure integer arithmetic;
    * the x148 oracle mirrors every step (HUGEINT for the >2⁶³
    * intermediates, identical trunc-toward-zero division).
    */
  private[graft] def componentChain(
      n: Long,
      s: Array[Long],
      gUpper: Array[Long],
      r: Int,
      squarings: Int
  ): (Seq[Array[Long]], Seq[Long], Long) = {
    val dim = s.length
    // the deflation chain runs on the RESCALED covariance so the BigInt
    // intermediates stay bounded and the oracle can mirror with HUGEINT
    var c = rescale(covariance(n, s, gUpper), 100000000L)
    val trace = math.max((0 until dim).map(i => c(i)(i)).sum, 1L)
    val out = (0 until r).map { _ =>
      val x = solveDominant(c, squarings)
      val xtx = math.max(x.map(v => v * v).sum, 1L)
      val xcx = (for (i <- 0 until dim; j <- 0 until dim)
        yield BigInt(c(i)(j)) * x(i) * x(j)).sum
      val t1 = xcx / xtx
      // deflation uses the UNclamped t1 (the oracle's xcx // xtx);
      // only the REPORTED share clamps
      c = Array.tabulate(dim, dim)((i, j) =>
        c(i)(j) - ((t1 * x(i) * x(j)) / xtx).toLong)
      (x, math.max(t1.toLong, 0L))
    }
    (out.map(_._1), out.map(_._2), trace)
  }

  /** Project every vector onto the corpus's top principal component.
    *
    * @param emb       (idCol, vecCol) frame
    * @param trainMod  covariance trains on `id % trainMod = 0` (1 = all)
    * @param squarings fixed matrix squarings (unrolled in the oracle);
    *                  10 → effective power 1024, enough for the flattest
    *                  measured gate spectrum (λ₂/λ₁ ≈ 0.98)
    * @return (idCol, proj) — proj = Σ_d q_d·x_d in fixed point, BIGINT
    */
  def topComponentProjections(
      emb: DataFrame,
      trainMod: Int = 1,
      squarings: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val q = quantize(vecCol)
    val (n, s, g) = trainedMoments(emb, trainMod, idCol, q)
    val x = powerIterate(n, s, g, squarings)
    // map-only projection with the component inlined as literals
    val proj = x.zipWithIndex
      .map { case (w, d) => element_at(q, d + 1) * lit(w) }
      .reduce(_ + _)
    emb.select(col(idCol), proj.as("proj"))
  }

  /** One-pass moments over the training sample; the result is
    * 1 + dim + dim(dim+1)/2 longs of bounded driver state. Shared by
    * the projection and reduction surfaces so the sample contract and
    * the empty-sample guard cannot drift.
    */
  private def trainedMoments(
      emb: DataFrame,
      trainMod: Int,
      idCol: String,
      q: Column
  ): (Long, Array[Long], Array[Long]) = {
    val row = emb
      .where(col(idCol) % trainMod === 0)
      .agg(GraftFunctions.intGram(q).as("m"))
      .select(col("m.n"), col("m.s"), col("m.g"))
      .head()
    require(!row.isNullAt(0),
      s"PCA training sample is empty ($idCol % $trainMod = 0 selected no rows)")
    (row.getLong(0), row.getSeq[Long](1).toArray, row.getSeq[Long](2).toArray)
  }

  /** Dimensionality REDUCTION: every vector projected onto the top `r`
    * principal components (solve-then-deflate, [[topComponents]]) — the
    * front half of an OPQ-style rotate-reduce-index stack, emitted as r
    * fixed-point BIGINT columns `p1..pr`. Same scale shape as
    * [[topComponentProjections]]: one IntGram pass over the training
    * sample, the dim²-bounded multi-component solve on the driver, one
    * map-only pass over the full corpus with all r components inlined
    * as literals (r codegen'd dot products per row, no join).
    */
  def reduceProjections(
      emb: DataFrame,
      r: Int = 4,
      trainMod: Int = 1,
      squarings: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val q = quantize(vecCol)
    val (n, s, g) = trainedMoments(emb, trainMod, idCol, q)
    val comps = topComponents(n, s, g, r, squarings)
    emb.select(col(idCol) +: projectionCols(q, comps): _*)
  }

  private def projectionCols(
      q: Column,
      comps: Seq[Array[Long]]
  ): Seq[Column] =
    comps.zipWithIndex.map { case (x, k) =>
      x.zipWithIndex
        .map { case (w, d) => element_at(q, d + 1) * lit(w) }
        .reduce(_ + _)
        .as(s"p${k + 1}")
    }

  /** Explained-variance accounting for ADAPTIVE-k reduction (x148): the
    * missing verb between x143 ("reduce to a fixed k") and x144 ("the
    * eval can veto a fixed k") — pick k from the data. One row per
    * candidate component 1..`rMax`: its spectral share in exact integer
    * ppm of the (rescaled) covariance trace, the cumulative share, and
    * `k` — the smallest component count whose cumulative share clears
    * `targetPpm`, or `rMax` when the spectrum never gets there (the
    * near-isotropic gate corpus: ~1.6%/component, the same honest
    * "don't reduce" signal x144 measures as recall collapse).
    *
    * Same scale shape as [[reduceProjections]]: one IntGram pass over
    * the training sample, the dim²-bounded chain on the driver, a
    * constant-size literal result (bounded-state contract).
    */
  def explainedVariance(
      emb: DataFrame,
      rMax: Int = 4,
      targetPpm: Long = 900000L,
      trainMod: Int = 1,
      squarings: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val spark = emb.sparkSession
    val (vars, trace) = {
      val q = quantize(vecCol)
      val (n, s, g) = trainedMoments(emb, trainMod, idCol, q)
      val (_, v, t) = componentChain(n, s, g, rMax, squarings)
      (v, t)
    }
    val (ppm, cum, k) = varianceK(vars, trace, rMax, targetPpm)
    import spark.implicits._
    ppm.indices
      .map(i => ((i + 1).toLong, ppm(i), cum(i), k))
      .toDF("comp", "var_ppm", "cum_ppm", "k")
  }

  /** Adaptive reduction: [[explainedVariance]]'s k, then project onto
    * the top k components — x143's map-only projection with the column
    * count chosen by the spectrum instead of by fiat.
    */
  def adaptiveReduceProjections(
      emb: DataFrame,
      rMax: Int = 4,
      targetPpm: Long = 900000L,
      trainMod: Int = 1,
      squarings: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val q = quantize(vecCol)
    val (n, s, g) = trainedMoments(emb, trainMod, idCol, q)
    val (comps, vars, trace) = componentChain(n, s, g, rMax, squarings)
    val (_, _, k) = varianceK(vars, trace, rMax, targetPpm)
    emb.select(col(idCol) +: projectionCols(q, comps.take(k.toInt)): _*)
  }

  /** The ONE owner of the k rule shared by [[explainedVariance]] (which
    * reports k) and [[adaptiveReduceProjections]] (which projects with
    * it): per-component variance shares in exact integer ppm, their
    * running sum, and k = the smallest component count whose cumulative
    * share clears `targetPpm` (all `rMax` if none does) — so the
    * reported k and the k actually used for projection cannot diverge.
    */
  private def varianceK(
      vars: Seq[Long],
      trace: Long,
      rMax: Int,
      targetPpm: Long): (Seq[Long], Seq[Long], Long) = {
    val ppm = vars.map(v => v * 1000000L / trace)
    val cum = ppm.scanLeft(0L)(_ + _).tail
    val k = cum.indexWhere(_ >= targetPpm) match {
      case -1 => rMax.toLong
      case i  => i + 1L
    }
    (ppm, cum, k)
  }
}
