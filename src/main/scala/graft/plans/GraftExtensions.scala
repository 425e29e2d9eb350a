package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: the deployment-grade way to
  * install graft's planner extensions cluster-wide —
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * or programmatically `SparkSession.builder().withExtensions(new
  * GraftExtensions)`. Sessions built without it (e.g. the driver's
  * Verify/Bench sessions) get the same strategy lazily through
  * `IntervalJoins.register` on first use, so both registration paths
  * are exercised: extensions in ExtensionsSpec, experimental-methods
  * in the q37 query path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => IntervalJoinStrategy)
    // transparent adoption: declarative `join(k = k && s <= pt < e)`
    // is rewritten to the custom operator during optimization
    ext.injectOptimizerRule(_ => RewriteRangeJoins)
    // first-class SQL for table maintenance (GRAFT OPTIMIZE/VACUUM) —
    // a delegating parser, so stock SQL is untouched
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // session-wide kernel functions (the third registration tier:
    // extensions-injected, catalog-scoped in GraftFunctions,
    // per-query temp in GraftSqlBridge) — same Expression either way
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_polyhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.PolyHash].getName, "graft_polyhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // arity is validated at plan time with a proper analysis error:
        // children.head alone would throw a raw NoSuchElementException
        // on zero args and SILENTLY IGNORE extras (graft_polyhash('a','b')
        // computing polyhash('a') is a wrong answer, not a convenience)
        if (children.length != 1)
          throw new IllegalArgumentException(
            s"graft_polyhash requires exactly 1 argument (a string column), " +
              s"got ${children.length}")
        graft.functions.PolyHash(children.head)
      }))
  }
}
