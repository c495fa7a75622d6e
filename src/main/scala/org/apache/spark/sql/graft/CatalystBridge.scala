package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge.
  *
  * Spark 4's unified Column API hides the catalyst expression behind
  * `private[sql]` accessors (org.apache.spark.sql.classic.ExpressionUtils).
  * Custom native expressions (graft.functions.*) need to cross that
  * boundary, so this one-file shim lives inside the org.apache.spark.sql
  * package — the standard extension pattern for third-party Catalyst
  * expressions. Nothing else in graft may depend on Spark internals
  * without going through here.
  */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
