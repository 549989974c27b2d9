package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-API (Dataset) equivalent of [[graft.api.Det.sumQ]]: an
  * `Aggregator[Double, Long, Double]` whose buffer is the exact quantized
  * long sum, so merge order never changes the result — demonstration of
  * the custom-UDAF machinery (the column-expression form in Det stays the
  * hot path: it is codegen'd, a registered Aggregator is not).
  */
class QuantizedSum(scale: Int = 4) extends Aggregator[Double, Long, Double] {
  private val p = math.pow(10, scale)
  override def zero: Long = 0L
  override def reduce(b: Long, a: Double): Long =
    b + math.floor(a * p + 0.5).toLong
  override def merge(b1: Long, b2: Long): Long = b1 + b2
  override def finish(r: Long): Double = r / p
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
