package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made the classic converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) private[sql]; this
  * package-scoped forwarder is the supported-by-visibility way for an
  * external library to build a `Column` over a custom Catalyst
  * expression (our codegen'd vector ops) without a UDF. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
