package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 32-bit md5-prefix hash — native, codegen'd replacement for the
  * compositional `conv(substring(md5(c), 1, 8), 16, 10)` chain
  * (TextFunctions.hash32), which materializes the full 32-char hex string,
  * substrings it, and re-parses base-16 per call. This expression digests
  * the UTF-8 bytes once and assembles the first 4 bytes into the same
  * unsigned 32-bit value — bit-identical to the chain and to the DuckDB
  * oracle's `('0x' || substr(md5(x),1,8))::BIGINT` (asserted in PlansSpec).
  * MinHash/SimHash call this once per shingle/token, so it is the hottest
  * scalar in the dedup family.
  */
case class Md5Prefix32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  // fail at analysis, not with a ClassCastException inside a running job
  // (ExpectsInputTypes is unavailable here — AbstractDataType is
  // private[sql], the same seam issue noted in ROUND_NOTES)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix32 requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.md5Prefix32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashExpressions.md5Prefix32($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)
}

object HashExpressions {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes of the UTF-8 input, big-endian unsigned. */
  def md5Prefix32(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }
}
