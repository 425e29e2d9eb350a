package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` expression-opaque (it wraps a ColumnNode);
  * the Column⇄Expression converters live in the `private[sql]`
  * `classic.ExpressionUtils`. This bridge re-exports just those two
  * conversions to the graft packages so custom Catalyst expressions
  * (e.g. graft.functions.ImageStats) can surface as Columns. Public
  * Spark API + source only — no other internals touched.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an (already resolved) custom logical plan as a DataFrame —
    * `classic.Dataset.ofRows` is `private[sql]`. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently append a planner strategy on a live session (the
    * runtime-registration alternative to spark.sql.extensions). */
  def addExtraStrategy(
      spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }

  /** Register a temp SQL function backed by a custom Catalyst
    * expression (so it is usable inside HOF lambdas). The session's
    * `sessionState` is `private[sql]`-reachable from this package. */
  def registerTempFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
    // truly idempotent: createOrReplaceTempFunction logs a WARN on
    // every re-registration, and operators call register() per query
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
