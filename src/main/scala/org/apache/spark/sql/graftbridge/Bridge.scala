package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the `private[sql]` Column ↔ Expression conversions
  * (Spark 4 moved them behind `org.apache.spark.sql.classic`). This is the
  * standard extension-library bridge pattern; nothing else of ours lives in
  * Spark's namespace. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
