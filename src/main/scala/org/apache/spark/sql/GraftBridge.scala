package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native expressions.
  *
  * Spark 4 made the conversion (`classic.ExpressionUtils`) private[sql];
  * extension libraries conventionally host a one-line shim inside the
  * package to build `Column`s over custom Catalyst expressions without
  * going through the (session-dependent) function registry. This is the
  * entire footprint inside Spark's namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Catalyst-expression → source-Filter translation for the graft
    * DSv2 file index (`DataSourceStrategy.translateFilter` is
    * protected[sql]; every lakehouse connector needs exactly this
    * call to turn the pushed data filters into prunable ranges).
    */
  def translateFilter(e: Expression): Option[sources.Filter] =
    execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = false)
}
