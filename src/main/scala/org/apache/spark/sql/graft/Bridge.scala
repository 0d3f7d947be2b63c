package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Expression bridge. Spark 4 made `ExpressionUtils` private[sql];
 * this shim lives under the org.apache.spark.sql package namespace (the
 * standard extension-library technique) to expose the two conversions our
 * custom Catalyst expressions need.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
