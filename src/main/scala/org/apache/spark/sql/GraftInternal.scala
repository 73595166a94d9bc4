package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column <-> catalyst
  * Expression converters (Spark 4 wraps Columns in ColumnNodes; classic
  * mode converts via `org.apache.spark.sql.classic.ExpressionUtils`).
  * Needed to expose custom codegen'd expressions (e.g. the tokenizer)
  * through the public `Column` API without a session-bound function
  * registry.
  */
object GraftInternal {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
