package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for double aggregation.
  *
  * Double SUM is order-dependent (IEEE754 addition is not associative), and
  * Spark's partial-aggregation order varies with partitioning — at 1000
  * executors the same query would return different low bits run to run, and
  * never hash-match a single-threaded DuckDB oracle.
  *
  * The fix is explicit integer quantization: `floor(x * 10^s + 0.5)` rounds
  * each value to `s` decimal digits using only IEEE754 ops (multiply, add,
  * floor), which are bit-identical in every engine — unlike a double→DECIMAL
  * cast, where Spark rounds the SHORTEST decimal representation of the double
  * (`BigDecimal(java.lang.Double.toString)`) while DuckDB rounds the exact
  * binary value, so the two disagree on ~1/1000 rows. The quantized longs
  * sum exactly and associatively; the final `sum / 10^s` division is one
  * more deterministic IEEE754 op.
  *
  * Bounds: the long sum is exact up to 2^63 and converts exactly to double
  * up to 2^53 (9e15) — at scale=4 that is ~900 G money-units per group,
  * plenty for a 100 TB portfolio; raise/lower `scale` to trade range for
  * precision. Half-up is toward +infinity (affects negatives); all corpus
  * measures are non-negative.
  *
  * SQL twin: `SUM(CAST(floor(x * 1e4 + 0.5) AS BIGINT)) / 1e4`
  * (spelled `10000.0` — the literal must be a DOUBLE power of ten).
  */
object Det {

  def pow10(scale: Int): Double = math.pow(10, scale)

  /** Quantize to `scale` decimal digits as an exact integer (LongType). */
  def quantize(c: Column, scale: Int = 4): Column =
    floor(c * lit(pow10(scale)) + lit(0.5))

  /** Order-insensitive double sum at `scale` decimal digits. */
  def sumQ(c: Column, scale: Int = 4): Column =
    sum(quantize(c, scale)) / lit(pow10(scale))

  /** Order-insensitive mean: exact integer sum / count. SQL twin:
    * `SUM(CAST(floor(x*1e4+0.5) AS BIGINT)) / 1e4 / COUNT(x)`.
    */
  def avgQ(c: Column, scale: Int = 4): Column =
    sumQ(c, scale) / count(c)
}
