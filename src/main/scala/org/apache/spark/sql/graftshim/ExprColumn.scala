package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge. Spark 4 made `Column` carry a
  * ColumnNode and moved the classic Expression conversions behind
  * `private[sql]` ([[ExpressionUtils]]) — the documented extension
  * path for custom expressions is SQL function registration, which
  * works for everything graft registers EXCEPT expressions that must
  * carry a runtime object with no SQL literal form (the broadcast
  * centroid-table handle of `TopKAssignBc`/`TopKRouteBc`). This shim
  * lives in the `org.apache.spark.sql` package tree solely to widen
  * those two conversions, the same access route a
  * SparkSessionExtensions rule compiles against. */
object ExprColumn {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
