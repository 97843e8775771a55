package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the text
  * hygiene pass a multilingual corpus needs before any fingerprint/dedup
  * stage: the same visible text can arrive precomposed (é = U+00E9) or
  * decomposed (e + U+0301) depending on the source, and without canonical
  * composition those are DIFFERENT fingerprints, different shingles,
  * different embeddings keys. Spark has no built-in normalization
  * function; a Scala UDF would break whole-stage codegen on the hottest
  * scan. The JDK's `java.text.Normalizer` implements the same Unicode
  * canonical-composition tables as DuckDB's utf8proc `nfc_normalize`, so
  * the oracle verifies parity directly.
  *
  * Fast paths keep the common case allocation-free: pure-ASCII input
  * (NFC is the identity on ASCII — one byte scan, the original
  * UTF8String is returned untouched) and already-normalized input
  * (`Normalizer.isNormalized` quick check, no second string built).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeExpressions.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeExpressions.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Locale-ROOT lowercasing as a native expression — Spark's `lower()`
  * routes any NON-ASCII string through the JVM default locale
  * (UTF8String.toLowerCaseSlow → String.toLowerCase()), so on a tr/az
  * JVM a capital I in mixed-script text becomes dotless ı and diverges
  * from the Locale.ROOT tokenizer kernel. The search prefilter's
  * losslessness proof needs the SAME lowering the tokenizer applies;
  * this is that lowering, with `lower()`'s ASCII fast path preserved. */
case class LowerRoot(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lower_root requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeExpressions.lowerRoot(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeExpressions.lowerRoot($c)")

  override protected def withNewChildInternal(newChild: Expression): LowerRoot =
    copy(child = newChild)
}

object NormalizeExpressions {

  /** Locale.ROOT lowercase; UTF8String's own ASCII path when possible. */
  def lowerRoot(s: UTF8String): UTF8String = {
    // isFullAscii scan is cheap; ASCII lowering is locale-free anyway
    if (s.isFullAscii) s.toLowerCase
    else UTF8String.fromString(s.toString.toLowerCase(java.util.Locale.ROOT))
  }

  /** NFC-normalize a UTF8String; identity (no allocation) for ASCII or
    * already-normalized input. */
  def nfc(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }

  private def isAscii(s: UTF8String): Boolean = {
    var i = 0
    val n = s.numBytes()
    while (i < n) {
      if (s.getByte(i) < 0) return false
      i += 1
    }
    true
  }
}
