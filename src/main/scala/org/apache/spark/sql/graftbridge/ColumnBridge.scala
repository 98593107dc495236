package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column↔Expression converters so the
  * engine can expose custom Catalyst expressions through the public
  * Column API (Spark 4 removed the public Column(expr) constructor).
  * Lives under org.apache.spark.sql.* for access — same technique the
  * reference used for its assembler fork (reference:
  * src/main/scala/org/apache/spark/ml/feature/SimpleVectorAssembler.scala).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
