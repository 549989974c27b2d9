package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Native codegen'd 16-bin byte histogram over a BINARY payload: bin k is
  * count(byte >> 4 == k) / max(len, 1) — the engine's stand-in "decoder"
  * for multimodal payloads ([[graft.multimodal.MultimodalQueries]]).
  *
  * Replaces the previous typed-Dataset `mapPartitions` decode: that path
  * forced every row across the encoder boundary (DeserializeToObject →
  * Scala tuple → SerializeFromObject), breaking WholeStageCodegen around
  * the scan. This expression is one fused loop over the payload bytes that
  * stays inside codegen via a static module call (same pattern as
  * [[Hash60]] / [[VecDot]]), allocating only the 16-slot result array.
  *
  * Where a REAL media decoder (JNI / native lib / Arrow-batched Python
  * UDF) must take over, `mapPartitions` over iterators is the right shape
  * — but a pure byte loop is expressible as a Catalyst expression, so it
  * should be one.
  *
  * Each bin is a small-integer count divided by the byte count — an exact
  * IEEE754 quotient, bit-identical to the DuckDB oracle twin
  * (`len(list_filter(bins, x -> x = k)) / CAST(greatest(n,1) AS DOUBLE)`).
  */
case class ByteHistogram(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_histogram requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "byte_histogram"

  override protected def nullSafeEval(input: Any): Any =
    ByteHistogram.eval(input.asInstanceOf[Array[Byte]])

  // module-instance call (no static forwarder) — see the Hash60 NB
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ByteHistogram$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
}

object ByteHistogram {
  /** Normalized high-nibble histogram; empty payload -> all zeros (the
    * max(len, 1) guard keeps the division defined).
    */
  def eval(payload: Array[Byte]): ArrayData = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 4) += 1.0
      i += 1
    }
    val n = math.max(payload.length, 1).toDouble
    var k = 0
    while (k < 16) { hist(k) /= n; k += 1 }
    new GenericArrayData(hist)
  }
}
