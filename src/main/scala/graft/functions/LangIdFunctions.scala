package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-stopword language-ID argmax as ONE token walk (r16, guide §4)
  * — the exact twin of [[graft.operators.TextAnalysis.langIdScores]]'
  * Column algebra, whose CASE-chain form inlines
  * `size(filter(toks, isin(markers)))` once per language per reference:
  * a single `langId(tokens(text))` column expanded to ~24 independent
  * `split(trim(text))` + array-filter evaluations PER ROW in the x127
  * screen predicate (read from the committed plan dump), and the same
  * multiplier rides every arc/curation surface that screens on
  * `lang_pred != 'und'`. This expression tokenizes once upstream and
  * counts all languages' marker hits in one pass.
  *
  * Semantics are byte-identical to the algebra (spec-pinned):
  *   - a hit is an element EQUAL to a marker (every occurrence counts,
  *     null elements never match — `isin`'s null semantics);
  *   - best = max count; the FIRST language in marker-list order with
  *     count == best wins when best > 0, else "und";
  *   - a NULL token array yields "und" (the Column form's `when` chain
  *     falls through to the "und" literal for NULL sizes under both
  *     ANSI and legacy sessions), so the expression is never NULL.
  */
case class LangIdArgmax(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression {

  require(markers.nonEmpty, "need at least one language")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  @transient private lazy val markerSets: Array[java.util.HashSet[UTF8String]] =
    markers.map { case (_, ms) =>
      val s = new java.util.HashSet[UTF8String]()
      ms.foreach(m => s.add(UTF8String.fromString(m)))
      s
    }.toArray

  @transient private lazy val langNames: Array[UTF8String] =
    markers.map { case (l, _) => UTF8String.fromString(l) }.toArray

  @transient private lazy val und: UTF8String = UTF8String.fromString("und")

  def compute(arr: ArrayData): UTF8String = {
    if (arr == null) return und
    val counts = new Array[Int](markerSets.length)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var l = 0
        while (l < markerSets.length) {
          if (markerSets(l).contains(t)) counts(l) += 1
          l += 1
        }
      }
      i += 1
    }
    var best = 0
    var l = 0
    while (l < counts.length) { if (counts(l) > best) best = counts(l); l += 1 }
    if (best <= 0) return und
    l = 0
    while (l < counts.length) { if (counts(l) == best) return langNames(l); l += 1 }
    und
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    compute(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdArgmax", this, classOf[LangIdArgmax].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        UTF8String ${ev.value} = $ref.compute(
          ${childGen.isNull} ? null : ${childGen.value});
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
