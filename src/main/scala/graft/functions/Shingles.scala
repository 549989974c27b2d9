package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingling of a token array: one fused loop emitting
  * the len-n+1 space-joined windows ([[graft.text.TextFns.shingles]]).
  *
  * Exists for the same reason as [[VecDot]]: the composed form
  * `transform(sequence(1, size-n+1), i -> concat_ws(' ', slice(toks,i,n)))`
  * runs INTERPRETED per element — a sequence materialization, a slice
  * allocation, and a lambda dispatch per shingle — and dominates every
  * dedup pipeline's scan (measured ~1.2 s of the 1.45 s shingle pass at
  * sf0.1; this loop does the same work in ~0.1 s). Output strings are
  * byte-identical to the composed form: UTF8String.concatWs over the same
  * windows in the same order.
  *
  * Null semantics: null token array -> null (callers that need the
  * composed form's empty-array-on-null coalesce it —
  * [[graft.text.TextFns.shingles]] does); fewer than n tokens -> empty
  * array. Token elements are never null for split() input; a null element
  * inside a window would make concat_ws skip it, which the composed form
  * also does.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles requires ARRAY<STRING> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Shingles$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {

  private val Sep = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
