package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused cosine similarity over two `array<double>` columns — a native
  * Catalyst expression with whole-stage codegen.
  *
  * The compositional form (`zip_with` product + three `aggregate` folds,
  * VectorFunctions.cosine) allocates an intermediate array and walks both
  * inputs four times per row; this expression is one fused loop, no
  * allocation. Semantics are IDENTICAL (same ascending-index accumulation
  * per sum, so float results stay bit-for-bit equal to the compositional
  * form and the DuckDB oracle) — asserted in PlansSpec.
  *
  * Exposed through the session FunctionRegistry (GraftFunctions.register)
  * and `call_function` — the public seam for custom expressions.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    // zero vector -> 0.0, not NaN (0/0): a single NaN would poison any
    // aggregate over similarities (e.g. k-means|| cost sums) and the
    // driver-side Ivf.cosine already defines the zero case as 0
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = $a.getDouble($i);
          double $yi = $b.getDouble($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        ${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
          : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column handle for the fused cosine (requires GraftFunctions.register
    * on the session, done by GraftSession.local). */
  def cosineFused(a: Column, b: Column): Column =
    call_function("cosine_fused", a, b)
}
