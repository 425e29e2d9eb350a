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

  /** Per-session set of function names THIS bridge registered. Keyed
    * by session identity so two sessions never mask each other. A
    * plain `functionExists` guard is not enough: the registry also
    * holds every builtin, so a name collision (now or after a Spark
    * upgrade) would silently skip registration and the graft builder
    * would never win. */
  private val registered =
    scala.collection.mutable.Set[(Int, String)]()

  /** Register a temp SQL function backed by a custom Catalyst
    * expression (so it is usable inside HOF lambdas). The session's
    * `sessionState` is `private[sql]`-reachable from this package.
    *
    * Idempotent WITHOUT being collision-blind: re-registration is
    * skipped only for names graft itself registered on this session
    * (operators call register() per query and
    * createOrReplaceTempFunction WARNs on every replace); any other
    * name — absent or a builtin collision — falls through to
    * createOrReplaceTempFunction so the graft builder always wins. */
  def registerTempFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = synchronized {
    val registry = spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
    val key = (System.identityHashCode(spark), name)
    if (!registered.contains(key)) {
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
      registered += key
    }
  }
}
