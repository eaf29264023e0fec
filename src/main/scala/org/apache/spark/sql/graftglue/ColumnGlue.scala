package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 routes the public Column API through ColumnNodes and keeps the
  * Expression conversion (`classic.ExpressionUtils`) `private[sql]`; a
  * library adding native Catalyst expressions needs exactly these two
  * functions. Placing the shim inside the org.apache.spark.sql namespace
  * is the established pattern for Spark-native extension libraries. Only
  * this object lives here — all real code stays under `graft`.
  */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
