package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access shim: `ExpressionUtils.column/expression` are
  * `private[sql]` in Spark 4's classic module, so the bridge between
  * graft's native kernel expressions and the public Column API lives
  * in this one file inside the sql namespace — the standard pattern
  * for Catalyst-extending libraries. Nothing else in graft reaches
  * into Spark internals this way.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
