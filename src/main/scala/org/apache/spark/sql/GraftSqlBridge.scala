package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column ↔ Catalyst Expression converters,
  * needed to expose custom Catalyst expressions (e.g. graft.functions.Fnv64) as
  * user-facing `Column`s. Spark 4 removed the public `Column.expr` / `new
  * Column(expr)` surface when the Column API became backend-agnostic; the
  * classic bridge lives behind `private[sql]`, so this shim is placed in the
  * `org.apache.spark.sql` package.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
