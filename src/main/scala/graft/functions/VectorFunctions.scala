package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector kernel over `array<double>` columns, built entirely from
  * higher-order `functions._` (codegen'd; no UDF deserialization in the hot
  * path). Folds are sequential left-to-right, which keeps float summation
  * order deterministic and identical to the DuckDB oracle's list_sum.
  */
object VectorFunctions {

  /** array<float> (parquet) -> array<double> for stable arithmetic. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  def maxAbs(v: Column): Column =
    aggregate(transform(v, x => abs(x)), lit(0.0), (acc, x) => greatest(acc, x))

  /** Unit-normalize against a PRE-BOUND norm column — bind `l2Norm` in its
    * own projection first; referencing the fold inside the lambda would
    * re-evaluate it per element (see TextFunctions.wordShingles). */
  def l2NormalizeWith(v: Column, boundNorm: Column): Column =
    transform(v, x => when(boundNorm === 0, lit(0.0)).otherwise(x / boundNorm))

  /** Symmetric int8 quantization against a pre-bound max-abs scale:
    * q = floor(127·x/scale + 0.5) clamped to [-127, 127]. floor-based
    * rounding on purpose — `round()` on doubles is the documented
    * Spark/DuckDB divergence point (decimal-repr HALF_UP vs binary), while
    * floor(x + 0.5) is the same IEEE op in both engines. */
  def quantizeInt8With(v: Column, boundScale: Column): Column =
    transform(v, x => when(boundScale === 0, lit(0))
      .otherwise(least(greatest(floor(x * 127 / boundScale + 0.5), lit(-127.0)), lit(127.0))
        .cast("int")))
}
