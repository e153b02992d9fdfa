package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Access shim for `private[sql]` seams the library legitimately needs:
  * Column ⇄ Expression conversion for custom Catalyst expressions and
  * session-local function registration. Lives inside the
  * `org.apache.spark.sql` package tree for visibility — the standard
  * pattern for Spark extension libraries (production wiring should prefer
  * `spark.sql.extensions` with [[graft.functions.GraftExtensions]], which
  * needs no shim).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, id: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
