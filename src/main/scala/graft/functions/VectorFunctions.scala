package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<T>` embedding columns via higher-order functions
  * (`zip_with` / `aggregate`) — codegen-adjacent built-ins, no UDF
  * serialization. Inputs are cast to array<double> up front so accumulation
  * is IEEE-double and bit-reproducible against the DuckDB oracle.
  */
object VectorFunctions {

  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Codegen'd tight-loop dot product (see [[ArrayDotProduct]]); accumulation
    * order matches the HOF equivalent
    * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` bit-for-bit. */
  def dot(a: Column, b: Column): Column = ArrayDotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
