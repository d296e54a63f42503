package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities — the multi-dimensional data-layout
  * primitive behind "OPTIMIZE ZORDER BY"-style clustering (Morton 1966;
  * the locality argument is the standard space-filling-curve one).
  *
  * Why it matters at 100 TB: a parquet lake prunes row groups by min/max
  * zone maps. Sorting by ONE column gives perfect pruning on that column
  * and none on any other; sorting by the interleaved-bit Morton code of
  * two columns bounds EVERY file's span in BOTH dimensions (fixing the
  * top k bits of the code fixes the top k/2 bits of each dimension), so
  * selective predicates on either column skip most files. The code is a
  * pure map-side integer expression — clustering the layout is then just
  * a range repartition + sortWithinPartitions on the code.
  *
  * Everything here is integer arithmetic end-to-end: bit interleaving is
  * exact, engine-portable, and oracle-checkable bit-for-bit.
  */
object ZOrder {

  /** Morton code of two `bits`-bit non-negative ints: dimension `a`
    * occupies even bit positions, `b` odd. Inputs must already lie in
    * [0, 2^bits) — callers bucketize (mod / scale) first.
    *
    * Built as a fixed unroll of shift/and/or terms — stays inside
    * whole-stage codegen, no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i + 1)
      )
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** The same unroll at the catalyst-`Expression` level — the builder the
    * SQL surface (`zorder_value(a, b, bits)` via GraftExtensions /
    * GraftFunctions) injects; the analyzer's implicit casts align operand
    * types exactly as they do for the Column form.
    */
  def zExpression(
      a: org.apache.spark.sql.catalyst.expressions.Expression,
      b: org.apache.spark.sql.catalyst.expressions.Expression,
      bits: Int
  ): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{
      BitwiseAnd, BitwiseOr, Expression, Literal, ShiftLeft, ShiftRight}
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        ShiftLeft(BitwiseAnd(ShiftRight(a, Literal(i)), Literal(1)), Literal(2 * i)),
        ShiftLeft(BitwiseAnd(ShiftRight(b, Literal(i)), Literal(1)), Literal(2 * i + 1)))
    }
    terms.reduce[Expression]((l, r) => BitwiseOr(l, r))
  }

  /** Inverse of [[zValue]]: extract dimension `even = true` (a) or the
    * odd dimension (b) back out of a Morton code. Spec fodder — pins the
    * interleave as a bijection.
    */
  def zInverse(z: Column, bits: Int, even: Boolean): Column = {
    val off = if (even) 0 else 1
    (0 until bits)
      .map(i => shiftleft(shiftright(z, 2 * i + off).bitwiseAND(lit(1)), i))
      .reduce(_.bitwiseOR(_))
  }

  /** Zone-map evidence for a Z-ordered layout: split the Morton range
    * into `buckets` equal-width zones (the "files" of the clustered
    * layout — deterministic width split, not a sampled range partition,
    * so the result is exactly reproducible) and report each zone's
    * min/max span in BOTH source dimensions. With 2^(2k) buckets over
    * `bits`-bit dims, each zone's span per dimension is ≤ 2^(bits-k) —
    * the pruning bound a one-column sort cannot give for the second
    * column.
    */
  def zoneSpans(
      df: DataFrame,
      a: Column,
      b: Column,
      bits: Int,
      buckets: Int
  ): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0, "buckets must be a power of 2")
    val zBits = 2 * bits
    val width = (1L << zBits) / buckets
    df.select(a.cast("long").as("za"), b.cast("long").as("zb"))
      .withColumn("z", zValue(col("za"), col("zb"), bits).cast("long"))
      .withColumn("zone", expr(s"z div ${width}L"))
      .groupBy("zone")
      .agg(
        count(lit(1)).as("n_rows"),
        min("za").as("min_a"),
        max("za").as("max_a"),
        min("zb").as("min_b"),
        max("zb").as("max_b")
      )
  }
}
