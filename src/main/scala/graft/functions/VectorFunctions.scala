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
