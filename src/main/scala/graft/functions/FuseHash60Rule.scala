package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Optimizer rule: recognize the composed 60-bit hash idiom
  *
  *   cast(conv(substring(md5(cast(s as binary)), 1, 15), 16, 10) as bigint)
  *
  * and fuse it into the native [[Hash60]] expression — one digest + shift
  * instead of hex-encode -> substring -> base-16 string parse, with no
  * intermediate allocations. Result bits are identical (Hash60's contract),
  * so the rewrite is semantics-preserving wherever the idiom appears,
  * including SQL text written against the composed built-ins.
  *
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`) — the
  * demonstration of SparkSessionExtensions' rule surface (§4.3).
  */
object FuseHash60Rule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case c @ Cast(
            Conv(
              Substring(Md5(inner), Literal(1, _), Literal(15, _)),
              Literal(16, _), Literal(10, _), _),
            LongType, _, _) =>
        stringChild(inner).map(Hash60(_)).getOrElse(c)
    }

  /** md5() over a string goes through an implicit cast-to-binary; Hash60
    * hashes the string's UTF-8 bytes, which is the same payload.
    */
  private def stringChild(e: Expression): Option[Expression] = e match {
    case Cast(child, BinaryType, _, _) if child.dataType == StringType => Some(child)
    case _ => None
  }
}
