package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 made these conversions `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); extension libraries
  * that define native Catalyst expressions conventionally expose them via
  * a shim in the sql namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Re-exports of `private[sql]` types that native-expression authors
  * need in signatures (e.g. `ExpectsInputTypes.inputTypes`). */
object Types {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
