package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between catalyst `Expression`s and the public `Column` API.
 *
 * Spark 4 moved Column construction behind `private[sql]`
 * `org.apache.spark.sql.classic.ExpressionUtils` (columnNodeSupport.scala in
 * the Spark source tree); this one-file shim in the sql package re-exports
 * the two conversions our custom expressions need. No Spark internals are
 * modified or shadowed.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager conversion via the session's ColumnNode converter. The lazy
    * wrapper from `expression` analyzes fine inside DataFrame plans but is
    * opaque to the FunctionRegistry path (it reaches codegen unconverted);
    * registry-registered functions must hand back a real expression tree. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
