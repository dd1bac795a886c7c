package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions installer for the engine's native kernels and
  * optimizer rules:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.expressions.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions()(_))
  * }}}
  *
  * makes `graft_intersect_bits`, `graft_dot_long`, and
  * `graft_sorted_intersect_count` available to SQL and `call_function`
  * without any per-query registration ([[LongArrayOps.register]] remains
  * for sessions created outside the library's control), and installs
  * [[graft.plans.RangeJoinRewrite]] (dormant until its bucket-width conf
  * is set; on an existing session, add it via
  * `spark.experimental.extraOptimizations`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    LongArrayOps.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[LongArrayOps.type].getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => new graft.plans.RangeJoinRewrite)
    ext.injectPlannerStrategy(_ => new graft.plans.MorAntiJoinStrategy)
    ext.injectTableFunction((
      FunctionIdentifier(TableChanges.name),
      TableChanges.info,
      TableChanges.build _))
  }
}
