package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnToExpr, exprToColumn}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: Unicode NFC normalization — the first text
  * op a multilingual crawl runs, because the SAME visible string arrives in
  * multiple byte encodings (é as U+00E9 vs e + combining U+0301; full NFC
  * covers Hangul jamo composition, canonical reordering of stacked marks,
  * singleton replacements) and every downstream exact/MinHash/shingle
  * dedup, token count, and equality join silently misses across forms
  * until byte forms are canonical. Spark has no built-in for this (the
  * usual workaround is a Scala/Python UDF — opaque to Catalyst, breaks
  * codegen); this expression wraps the JDK's `java.text.Normalizer`
  * (Unicode-standard NFC, the same algorithm DuckDB's `nfc_normalize`
  * implements, which is what makes the driver oracle exact) behind
  * `doGenCode`, so it participates in whole-stage codegen like any
  * built-in. Fast path: `Normalizer.isNormalized` skips the copy for the
  * (overwhelmingly common) already-NFC input. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Column API: NFC-normalize a string column. */
  def nfc(c: Column): Column = exprToColumn(NfcNormalize(columnToExpr(c)))

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
