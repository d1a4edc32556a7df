package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column API is Connect-neutral and no longer exposes the
  * catalyst Expression directly; the classic bridge is private[sql], so
  * this shim (in an org.apache.spark.sql subpackage, the standard
  * extension technique) re-exports the two conversions custom-expression
  * libraries need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
