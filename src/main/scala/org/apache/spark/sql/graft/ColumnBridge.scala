package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge.
  *
  * Spark 4 Columns wrap ColumnNodes (Connect-compatible IR), and the
  * classic-mode converters live in `private[sql]` ExpressionUtils — so
  * libraries defining native Catalyst expressions need this one-hop
  * package-internal shim (the extension alternative,
  * SparkSessionExtensions.injectFunction, forces SQL-string call sites
  * and per-session registration).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER ColumnNode → Catalyst conversion. [[expression]] wraps the
    * node lazily (ColumnNodeExpression), which only the Dataset
    * analysis path unwraps — a function-registry builder must instead
    * return a plain Catalyst tree the analyzer can resolve, or codegen
    * later meets the still-wrapped node and throws INTERNAL_ERROR.
    * Used by the SQL-surface registration of the Column-API helpers
    * (graft.plans.GraftExtensions.sqlFunctions).
    */
  def resolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
