package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition) — the ingest-hygiene primitive that folds visually
  * identical byte sequences ("e" + COMBINING ACUTE vs precomposed "é")
  * to one canonical form, so downstream tokenization / dedup / equality
  * see one spelling.
  *
  * Fast path: `Normalizer.isNormalized` is an allocation-free scan and
  * virtually every real-world string (all-ASCII in particular) passes
  * it, so the common case returns the input UTF8String untouched; only
  * strings that actually need composing pay the String round-trip.
  * Codegen calls the same static kernel — the expression stays inside
  * WholeStageCodegen spans.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Lenient UTF-8 decode of a binary column: invalid byte sequences
  * become U+FFFD REPLACEMENT CHARACTER instead of failing the task —
  * the ingest-boundary complement of Spark's ANSI `decode(bin, 'UTF-8')`
  * (which faults the whole job on one bad byte 2 TB into a scan). The
  * JDK `String(byte[], UTF_8)` constructor implements exactly the
  * standard substitution-on-malformed policy.
  */
case class Utf8DecodeLenient(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "utf8_decode_lenient"

  override def nullSafeEval(v: Any): Any =
    Utf8DecodeLenient.decode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Utf8DecodeLenient.decode($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Utf8DecodeLenient =
    copy(child = newChild)
}

object Utf8DecodeLenient {
  def decode(bytes: Array[Byte]): UTF8String =
    UTF8String.fromString(
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
}
