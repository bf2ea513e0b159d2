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
}
