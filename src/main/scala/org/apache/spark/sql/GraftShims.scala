package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge, placed in the Spark namespace because
  * Spark 4 made `Column.expr` / `ExpressionUtils` `private[sql]`.
  * This is the established pattern for Spark extension libraries and
  * lets graft's operators build Columns from its native Catalyst
  * expressions WITHOUT requiring [[graft.functions.GraftExtensions]]
  * to be installed on the session — the extensions remain the way to
  * make the functions visible BY NAME in SQL, but the Scala API now
  * works on any plain SparkSession. */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
