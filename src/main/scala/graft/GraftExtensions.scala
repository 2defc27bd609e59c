package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * The `spark.sql.extensions` entry point: plugs the library's whole SQL
 * surface (the `fn_transform_*` DSL family and the `graft_*` native
 * expressions/aggregates) into any session at BUILD time, with zero code —
 *
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 *
 * or `SparkSession.builder().withExtensions(new GraftExtensions)`. This is
 * the deployment door for clusters where the session is constructed by a
 * platform (notebooks, job servers, Thrift/Connect servers) and
 * [[GraftSession.create]]'s programmatic registration never runs.
 * Injected functions live in the session's built-in registry — visible to
 * every `spark.sql(...)` and `expr(...)` — and construct the exact same
 * expression trees as the Column API, so codegen and pushdown behave
 * identically through either door.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    for ((name, builder) <- plans.GraftExpressions.sqlFunctions ++
        functions.Registry.sqlFunctions)
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
}
