package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]` at the Scala level (public in bytecode), so this tiny
  * shim inside the sql package exposes the two conversions graft's native
  * expressions need. No Spark internals are modified. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a Catalyst expression.
    * `expression` returns a lazy `ColumnNodeExpression` wrapper whose
    * catalyst children are not materialized — useless for tree
    * inspection (e.g. collecting referenced column names before a plan
    * exists). */
  def eagerExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
