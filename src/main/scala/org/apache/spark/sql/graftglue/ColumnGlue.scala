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

  /** EAGER Column→Expression conversion. `expression` wraps the column
    * node in a lazy `ColumnNodeExpression` that only the Dataset API
    * boundary unwraps — an expression returned from a FunctionRegistry
    * builder never crosses that boundary and would reach codegen
    * unconverted. The classic converter resolves the node tree to real
    * (possibly Unresolved*) Catalyst expressions the analyzer handles. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a native-expression SQL function on an EXISTING session
    * (`SparkSession.sessionState` is `private[sql]`). The
    * `SparkSessionExtensions.injectFunction` path (public API) covers
    * sessions built with `spark.sql.extensions`; this covers sessions
    * handed to a library after construction — e.g. the driver gate. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
