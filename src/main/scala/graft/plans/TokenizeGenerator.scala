package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst table function: `tokenize(text)` -> one row per token.
  *
  * Full-parity port of the reference's Flink SQL UDTF
  * (gmall-realtime-self/.../app/func/SplitFunction.java:12-29, used via
  * `LATERAL TABLE(splitfunc(...))` at DwsTrafficKeywordPageViewWindow
  * .java:90-97): after GraftFunctions.register, SQL can write
  * `LATERAL VIEW tokenize(text) t AS word`.
  *
  * Semantics are PINNED to TextFunctions.tokens (lowercase, split on
  * non-[a-z0-9] runs, drop empties) — asserted equal in PlansSpec.
  */
case class TokenizeGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("word", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT)
      s.split("[^a-z0-9]+").iterator
        .filter(_.nonEmpty)
        .map(t => InternalRow(UTF8String.fromString(t)))
        .toSeq
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeGenerator =
    copy(child = newChild)
}

/** Session registration for the engine's SQL-surface functions. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize", exprs => TokenizeGenerator(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_fused", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
  }
}
