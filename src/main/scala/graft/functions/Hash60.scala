package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd equivalent of
  * `conv(substring(md5(x), 1, 15), 16, 10) :: long`
  * (the engine's "hash a string to a non-negative 60-bit integer"
  * primitive, [[graft.text.TextFns.hash60]]): first 60 bits of the MD5
  * digest, i.e. the value of the first 15 hex characters.
  *
  * Fuses three expressions (md5 hex-encode -> substring -> base-16 parse)
  * into one digest + shift, with no intermediate UTF8String allocations.
  * Stays inside WholeStageCodegen via a static call — the same pattern
  * Spark's own hash expressions use. Bit-compatible with the composed
  * form AND with the DuckDB oracle twin
  * `CAST(('0x'||substr(md5(x),1,15))::UBIGINT AS BIGINT)`.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash60 requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.eval(input.asInstanceOf[UTF8String])

  // NB: must call the module instance (Hash60$.MODULE$) — scalac emits no
  // static `eval` forwarder on the companion class because Expression
  // already has instance `eval` methods, so `Hash60.eval(...)` fails Janino
  // compilation and silently drops the whole stage to interpreted mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5 == top 60 bits of the big-endian digest ==
    * (first 8 bytes as unsigned long) >>> 4. Always non-negative.
    */
  def eval(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
