package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the composed ordered-fold dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * and fuse it into the native [[VecDot]] expression — one codegen'd loop
  * instead of two interpreted higher-order functions and an intermediate
  * product array. The fold is a sequential index-order accumulation on
  * both sides (VecDot's contract), null/length semantics match zip_with
  * padding, and empty arrays give the 0.0 zero — so the rewrite is
  * semantics-preserving wherever the idiom appears, including SQL text.
  *
  * The match is deliberately strict: double arrays, a bare x*y zip lambda,
  * a 0.0 zero, a bare acc+v merge in that argument order, and an identity
  * finish — anything else (e.g. the squared-error fold in the int8
  * quantizer) is left untouched.
  */
object FuseVecDotRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(aa: NamedLambdaVariable, av: NamedLambdaVariable, _),
              Seq(ma: NamedLambdaVariable, mv: NamedLambdaVariable), _),
            LambdaFunction(fb: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if mx.exprId == zx.exprId && my.exprId == zy.exprId &&
            aa.exprId == ma.exprId && av.exprId == mv.exprId &&
            fb.exprId == fv.exprId &&
            isDoubleArray(a) && isDoubleArray(b) =>
        VecDot(a, b)
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
}
