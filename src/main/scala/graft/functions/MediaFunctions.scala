package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** L1-normalized 256-bin byte histogram of a binary payload — the cheap
  * content signature used by the multimodal operators (corrupt-file
  * detection, format clustering, near-dup blocking on media). One pass over
  * the bytes per row, map-side only.
  */
case class ByteHistogram(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val counts = new Array[Int](256)
    var i = 0
    while (i < bytes.length) {
      counts(bytes(i) & 0xff) += 1
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    val out = new Array[Float](256)
    var j = 0
    while (j < 256) {
      out(j) = counts(j) / n
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
