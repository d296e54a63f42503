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

/** Static codepoint-class counter backing [[ScriptCounts]] — a plain
  * static method so the expression codegens to one call and stays
  * inside whole-stage fusion (the [[UnicodeNorm.nfc]] shim pattern).
  */
object ScriptCount {
  /** (latin, cyrillic, cjk, digit, space, other) counts packed into an
    * InternalRow. Classes (documented contract, shared with the x110
    * oracle's closed forms):
    *   - latin: ASCII A–Z a–z ONLY (extended Latin → other, keeping the
    *     oracle's `[A-Za-z]` regex an exact twin);
    *   - cyrillic: U+0400–U+04FF; cjk: U+4E00–U+9FFF unified ideographs
    *     plus U+3040–U+30FF kana;
    *   - digit: ASCII 0–9; space: EXACTLY the RE2 `\s` set the oracle
    *     regex counts — tab, LF, FF, CR, space (measured in DuckDB:
    *     `\s` excludes `\v` U+000B and every non-ASCII whitespace).
    *     `Character.isWhitespace` would additionally match U+001C–1F,
    *     U+2028/29, ideographic space etc. and silently land them in
    *     n_space while the oracle counts them in n_other;
    *   - other: everything else (including all non-ASCII whitespace),
    *     surrogate pairs counted once (codepoints, not UTF-16 units —
    *     matching both engines' character-count semantics).
    */
  def counts(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    var latin, cyr, cjk, digit, space, other = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) latin += 1
      else if (cp >= 0x0400 && cp <= 0x04ff) cyr += 1
      else if ((cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3040 && cp <= 0x30ff)) cjk += 1
      else if (cp >= '0' && cp <= '9') digit += 1
      else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r') space += 1
      else other += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(latin, cyr, cjk, digit, space, other)
  }
}

/** Per-document Unicode script histogram — the mixed-script signal
  * (spam and keyword-stuffed pages mix scripts mid-word; clean corpora
  * are script-coherent), the x110 front end. Returns
  * `struct<n_latin, n_cyrillic, n_cjk, n_digit, n_space, n_other>`,
  * one codepoint pass, map-only. NULL only for null input.
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_latin", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_cyrillic", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_cjk", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_digit", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_space", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_other", org.apache.spark.sql.types.IntegerType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    ScriptCount.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScriptCount.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "script_counts"
}
