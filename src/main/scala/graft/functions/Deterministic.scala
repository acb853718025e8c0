package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic floating-point aggregation.
  *
  * A plain `sum(double)` is order-dependent: Spark's partial aggregation
  * order varies with partitioning, so the result is not bit-reproducible and
  * cannot hash-match a single-threaded DuckDB oracle. Routing the sum
  * through an exact decimal makes it associative (exact integer arithmetic),
  * so any partial-aggregation order yields the same value; casting the exact
  * result back to double is a single deterministic IEEE rounding.
  *
  * Safety of the double→decimal(18,6) cast: a double is a dyadic rational
  * m/2^k. Landing exactly on a scale-6 half-boundary would require the value
  * to equal odd/(2·10^6), whose denominator contains 5^6 — impossible for a
  * dyadic rational. Hence Spark's HALF_UP vs any other nearest-rounding mode
  * can never disagree on these inputs, and both engines produce identical
  * decimals, identical sums, and identical doubles.
  */
object Deterministic {
  private val Dec = DecimalType(18, 6)

  /** Order-independent, bit-reproducible sum of a double column. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Order-independent average: exact decimal sum, one double division. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast("double") / count(lit(1))

  /** DuckDB oracle fragment equivalent to [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"

  /** DuckDB oracle fragment equivalent to [[davg]]. */
  def davgSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)"
}
