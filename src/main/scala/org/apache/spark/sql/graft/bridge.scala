package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one `private[sql]`-crossing shim in the library (the standard
  * extension-library pattern — Spark's Column↔Expression converters are
  * `private[sql]` in 4.x, and custom Catalyst expressions need exactly
  * these two hops plus function registration). Everything else lives in
  * `graft.*` against public APIs; keep this file the complete inventory of
  * internal surface so upgrades audit one place.
  */
object Bridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Registers a SQL function builder on an existing session (idempotent —
    * re-registration replaces). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
