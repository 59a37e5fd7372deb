package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression. Spark has
  * no built-in normalizer, and a Scala UDF would break whole-stage
  * codegen around it; this generates a direct `java.text.Normalizer`
  * call (with a fast already-normalized check that skips the rebuild —
  * the overwhelmingly common case for clean corpora). NFC output is
  * stable across Unicode versions by the normalization stability
  * policy, so any engine's NFC (e.g. DuckDB's `nfc_normalize`) is a
  * valid oracle.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Static entry shared by interpreted and generated code paths. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

object StringExpressions {
  def nfc_normalize(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
