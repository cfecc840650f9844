package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column ⇄ Expression converters, so graft can
  * register custom Catalyst aggregates (e.g. graft.expr.MaListAgg) as
  * Columns. Lives in org.apache.spark.sql solely for `private[sql]` access.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER column-node → catalyst conversion. [[expression]] wraps the node
    * lazily (`ColumnNodeExpression`, Unevaluable); that placeholder is only
    * converted on the Dataset API paths — an expression RETURNED FROM a
    * FunctionRegistry builder (see graft.GraftExtensions) bypasses them and
    * would reach codegen unconverted. Function builders must use this. */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
