package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared runtime for [[NfcNormalize]] — a static method so generated code
  * can call it, keeping the expression inside whole-stage codegen.
  */
object UnicodeNorm {

  /** Unicode NFC (canonical composition) of a UTF8String.
    *
    * Fast path: a string whose byte count equals its character count is
    * pure ASCII, and ASCII is NFC-invariant — return the input untouched
    * (no String materialization). Web corpora are majority-ASCII, so at
    * 100 TB this skips the JVM String round-trip for most rows; the
    * non-ASCII tail pays one decode + Normalizer pass + encode, which is
    * the irreducible cost of normalization on any engine.
    */
  def nfc(s: UTF8String): UTF8String =
    if (s.numBytes() == s.numChars()) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
}

/** Unicode NFC normalization as a Catalyst expression (Spark has no
  * built-in normalizer). Curation pipelines normalize before hashing /
  * dedup so that composed ("é") and decomposed ("e" + U+0301) spellings of
  * the same text can never land on different sides of a dedup or a
  * decontamination check.
  *
  * Codegen'd via a static-call shim — the whole-stage generated code calls
  * [[UnicodeNorm.nfc]] directly, so upstream/downstream expressions stay
  * fused in one generated stage.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}
