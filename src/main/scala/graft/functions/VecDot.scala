package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product of two double arrays — the engine's vector
  * primitive ([[graft.sim.SimFns.dot]]), equivalent to the composed
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` BIT-EXACTLY: one
  * sequential accumulation in index order (IEEE754 addition is
  * non-associative, so the iteration order IS the semantics — it matches
  * both the composed form and the DuckDB twin `list_reduce`).
  *
  * Exists because Spark's higher-order functions are interpreted (no
  * doGenCode): per-row lambda dispatch plus a materialized intermediate
  * product array. This expression is one fused loop over the two
  * ArrayData, stays inside WholeStageCodegen via a static module call
  * (same pattern as [[Hash60]]), and allocates nothing.
  *
  * Null semantics mirror the composed form: null array, length mismatch
  * (zip_with pads with null), or any null element (null product poisons
  * the fold) -> null result.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // call through Hash60-style MODULE$ (no static forwarder exists); the
  // boxed java.lang.Double return carries the null case across the call
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VecDot$$.MODULE$$.eval($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Sequential index-order fold; null on length mismatch or null element
    * (the composed zip_with/aggregate result for those inputs).
    */
  def eval(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
