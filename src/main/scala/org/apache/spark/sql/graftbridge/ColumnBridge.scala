package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> Expression converters.
  *
  * Spark 4 hides the Expression-backed Column constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`; a library shipping
  * custom Catalyst expressions (graft.functions.CosineSimExpr) reaches it
  * from an `org.apache.spark.sql` subpackage — the standard pattern for
  * Spark-native extension libraries. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
