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
}
