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

  /** int8 scalar-quantized dot mirror ([[Kernels.sq8Dot]]): exact integer
    * arithmetic, so no accumulation-order caveat applies — a lambda-list
    * form is fine where the float mirrors must unroll. The NaN-clips-HIGH
    * (code 127) cross-engine claim is exercised on the DuckDB side by the
    * literal-NaN probe in tools/check_oracle.py (sq8_nan_probe) — the
    * synthetic embeddings contain no NaN, so the hash gate alone never
    * evaluates this fragment's LEAST/GREATEST NaN ordering. */
  def sq8Sql(a: String, b: String, dim: Int = 64): String =
    s"""CAST(list_sum(list_transform(range(1, ${dim + 1}), i ->
       |      CAST(floor(GREATEST(-1.0, LEAST(1.0, $a[i]))*127 + 0.5) AS BIGINT)
       |      * CAST(floor(GREATEST(-1.0, LEAST(1.0, $b[i]))*127 + 0.5) AS BIGINT)))
       |      AS BIGINT)""".stripMargin
}
