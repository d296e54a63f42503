package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity between two embedding vectors, as a native Catalyst
  * expression with whole-stage codegen (`doGenCode`) — the hot inner loop of
  * brute-force ANN stays inside Tungsten-generated Java, no UDF
  * (de)serialization, no boxing (SURVEY.md §4.4).
  *
  * Supports array<float> and array<double> children (testdata
  * embeddings.parquet is array<float>, FIXTURES.md §4). Accumulation is in
  * double regardless of element type. Returns NULL on NULL input, 0.0 when
  * either vector has zero norm, and computes over min(len(a), len(b))
  * elements if lengths differ (defensive; real pipelines have fixed dims).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    val fl = elemIsFloat(left); val fr = elemIsFloat(right)
    var i = 0
    while (i < n) {
      val xi = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (fr) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getR = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = (double) $a.$getL($i);
           |  double $yi = (double) $b.$getR($i);
           |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
           |}
           |${ev.value} = ($nx == 0.0 || $ny == 0.0)
           |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sign-random-projection LSH buckets for `tables` independent hash tables,
  * computed in ONE expression evaluation per vector (array<int> of length
  * `tables`) — the same anti-recompute design as MinHashBands: emitting all
  * tables from a single expression means no projection rewrite can inline
  * the per-table computation N times (SURVEY.md §8.3 lesson).
  *
  * Bucket bit b of table t = sign of dot(v, h_{t,b}) where plane component
  * h_{t,b}[j] = (XXH64(j, XXH64(t*1024+b, seed)) mod 2001 − 1000)/1000 ∈
  * [−1, 1] — deterministic in `seed`, no RNG state to ship, identical on
  * every executor. Codegen'd (`doGenCode`): the dim × tables × bits inner
  * loop runs inside whole-stage-generated Java.
  */
case class RpBuckets(child: Expression, tables: Int, bitsPerTable: Int, seed: Int)
    extends UnaryExpression {
  require(tables >= 1, "need at least one table")
  require(bitsPerTable >= 1 && bitsPerTable <= 30, "bucket must fit an int")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val fl = elemIsFloat
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bitsPerTable) {
        val planeSeed = XXH64.hashInt(t * 1024 + b, seed.toLong)
        var dot = 0.0
        var j = 0
        while (j < n) {
          val h = XXH64.hashLong(j.toLong, planeSeed)
          val c = (java.lang.Math.floorMod(h, 2001L) - 1000L) / 1000.0
          dot += (if (fl) v.getFloat(j).toDouble else v.getDouble(j)) * c
          j += 1
        }
        if (dot >= 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val t = ctx.freshName("t"); val b = ctx.freshName("b"); val j = ctx.freshName("j")
        val bucket = ctx.freshName("bucket"); val planeSeed = ctx.freshName("planeSeed")
        val dot = ctx.freshName("dot"); val h = ctx.freshName("h"); val c = ctx.freshName("c")
        s"""
           |int $n = $a.numElements();
           |int[] $out = new int[$tables];
           |for (int $t = 0; $t < $tables; $t++) {
           |  int $bucket = 0;
           |  for (int $b = 0; $b < $bitsPerTable; $b++) {
           |    long $planeSeed = $xxh.hashInt($t * 1024 + $b, ${seed}L);
           |    double $dot = 0.0;
           |    for (int $j = 0; $j < $n; $j++) {
           |      long $h = $xxh.hashLong((long) $j, $planeSeed);
           |      double $c = (java.lang.Math.floorMod($h, 2001L) - 1000L) / 1000.0;
           |      $dot += ((double) $a.$get($j)) * $c;
           |    }
           |    if ($dot >= 0) $bucket |= (1 << $b);
           |  }
           |  $out[$t] = $bucket;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dot product, same design as [[CosineSimilarity]]. Useful when vectors are
  * pre-normalized (then dot == cosine and we skip the sqrt per pair).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val fl = elemIsFloat(left); val fr = elemIsFloat(right)
    var dot = 0.0; var i = 0
    while (i < n) {
      val xi = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (fr) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getR = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += ((double) $a.$getL($i)) * ((double) $b.$getR($i));
           |}
           |${ev.value} = $dot;
           |""".stripMargin
      }
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
