package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved Column↔Expression conversion behind private[sql]
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Custom Catalyst
  * expressions still need the bridge, so expose it from a subpackage of
  * org.apache.spark.sql (the standard pattern for library extensions
  * until a public API lands). */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
