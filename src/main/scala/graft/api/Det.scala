package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for double aggregation.
  *
  * Double SUM is order-dependent (IEEE754 addition is not associative), and
  * Spark's partial aggregation order varies with partitioning — at 1000
  * executors the same query would return different low bits run to run, and
  * never hash-match a single-threaded DuckDB oracle. Routing the sum through
  * DECIMAL makes it exact and associative: per-row half-up rounding at the
  * given scale is identical in Spark and DuckDB, decimal addition is exact,
  * and the final DECIMAL→DOUBLE conversion is correctly rounded in both.
  *
  * SQL twin: `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
  */
object Det {

  /** Order-insensitive double sum at `scale` decimal digits. */
  def sumDec(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-insensitive mean: exact decimal sum / count. SQL twin:
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)`.
    */
  def avgDec(c: Column, scale: Int = 4): Column =
    sumDec(c, scale) / count(c)
}
