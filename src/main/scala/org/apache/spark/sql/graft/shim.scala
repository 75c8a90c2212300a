package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public
  * Column API. Spark 4 made the Expression⇄Column converters
  * `private[sql]` (Column is column-node based for Connect parity);
  * this shim re-exports just the two classic-mode converters graft
  * needs to ship custom codegen expressions — the sanctioned extension
  * path (SparkSessionExtensions.injectFunction takes Expression
  * builders too; this is the same surface for direct Column use).
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
