package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for the engine's native expressions.
  *
  * Two routes to the same FunctionRegistry entries:
  *   1. `spark.sql.extensions=graft.functions.GraftExtensions` — the
  *      standard plugin route for clusters;
  *   2. [[GraftFunctions.register]] — imperative, idempotent, called by the
  *      query builders so the functions exist in ANY session the driver
  *      hands us.
  */
object GraftFunctions {

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("hash60", classOf[Hash60].getName,
      children => Hash60(children.head)),
    ("vec_dot", classOf[VecDot].getName,
      children => VecDot(children(0), children(1))),
    ("shingles", classOf[Shingles].getName,
      // n must be a foldable integer literal (the window width is part of
      // the operator, not data)
      children => Shingles(children(0),
        children(1).eval().asInstanceOf[Number].intValue())),
    ("cms_estimate", classOf[CmsEstimate].getName,
      children => CmsEstimate(children(0), children(1))),
    // Spark keeps the bloom build/probe pair in its INTERNAL registry
    // (InjectRuntimeFilter constructs them directly); exposing both makes
    // the manual semi-join-pushdown pattern expressible from SQL/DataFrame
    // code (see RelationalQueries.bloomPrefilterJoin)
    ("bloom_filter_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      children => org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(children(0), children(1), children(2), 0, 0)
        .toAggregateExpression()),
    ("might_contain",
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      children => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(children(0), children(1))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, className, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }
    ext.injectOptimizerRule(_ => FuseHash60Rule)
    ext.injectOptimizerRule(_ => FuseVecDotRule)
  }
}
