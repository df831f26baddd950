package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as codegen'd
  * higher-order-function compositions (zip_with/aggregate) — no UDFs.
  *
  * All arithmetic is done in double after an explicit element cast so the
  * DuckDB mirror (`list_dot_product(a::DOUBLE[], b::DOUBLE[])`) computes
  * bit-comparable values at oracle-rounding precision.
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  def l2Distance(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Squared L2 (argmin-equivalent to L2, skips the sqrt). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  // ---- DuckDB oracle mirrors ----
  // The HOF folds above evaluate term-by-term left to right; these emit the
  // same chain unrolled (left-assoc in SQL), so both engines perform the
  // identical IEEE double operation sequence and produce bit-equal results.

  def dotSql(a: String, b: String, dim: Int = 64): String =
    (1 to dim).map(j => s"$a[$j]*$b[$j]").mkString(" + ")

  def cosineSql(a: String, b: String, dim: Int = 64): String =
    s"(${dotSql(a, b, dim)}) / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)}))"

  def l2SqSql(a: String, b: String, dim: Int = 64): String =
    (1 to dim).map(j => s"($a[$j]-$b[$j])*($a[$j]-$b[$j])").mkString(" + ")
}
