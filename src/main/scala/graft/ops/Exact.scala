package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Engine-independent exact aggregation over double columns.
  *
  * Plain `sum(double)` is order-dependent: Spark's partial/final aggregate
  * tree and DuckDB's sequential scan accumulate in different orders, so the
  * low bits differ and a hash-compare oracle flakes. Casting each element to
  * DECIMAL(18,4) first is deterministic (the IEEE-754 double is identical in
  * both engines, and double→decimal rounding is well-defined), the decimal
  * sum is exact (no rounding at all), and the final cast back to double is
  * deterministic again. Cost: decimal aggregation is slower than double
  * aggregation, but it stays inside whole-stage codegen and partial
  * aggregation, so the shape of the plan (and its 100 TB scalability) is
  * unchanged.
  *
  * DuckDB oracle equivalent: `CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
  */
object Exact {
  private val D = DecimalType(18, 4)

  /** Order-independent sum of a money-like double column. Unbounded
    * (decimal widens); ~2.5× the cost of a plain double sum. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Order-independent mean: exact sum / exact count, one double division. */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(c)

  /** Faster exact sum for columns with 4-dp precision and PROVABLY bounded
    * per-group magnitude: scale to a long (round half-up, same as the
    * decimal cast), sum primitives inside codegen, unscale. Exact while
    * |group sum| < 2^63/10^4 ≈ 9.2e14 — fine for money columns at any
    * benchmark scale, but prefer [[dsum]] when group cardinality ×
    * magnitude can approach that bound (e.g. global sums over 10^12 rows).
    * Oracle: `sum(CAST(round(x*10000, 0) AS BIGINT)) / 10000.0`. */
  def dsumScaled(c: Column): Column =
    sum(round(c * 10000, 0).cast("long")) / 10000.0

  /** Scaled-long mean — same bound caveat as [[dsumScaled]]. */
  def davgScaled(c: Column): Column =
    sum(round(c * 10000, 0).cast("long")) / 10000.0 / count(c)
}
