package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization
  * (canonical decomposition followed by canonical composition, UAX #15).
  *
  * Why it exists: Spark has no normalization builtin, yet a multilingual
  * corpus mixes composed (U+00E9 `é`) and decomposed (`e` + U+0301) forms
  * of the same text — exact dedup, token counting, and equality joins all
  * silently treat them as different documents unless the pipeline
  * canonicalizes first. NFC is the standard web-text canonical form (and
  * what DuckDB's `nfc_normalize` implements, which oracle-pairs this).
  *
  * Per-row, allocation only when the string actually changes:
  * `Normalizer.isNormalized` is a cheap scan that short-circuits the
  * (dominant) already-NFC case, so ASCII-mostly corpora pay almost nothing.
  * Both engines implement the same Unicode standard algorithm, so results
  * are byte-identical.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(t: Any): Any =
    NormalizeText.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.NormalizeText.nfc($t)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }
}
