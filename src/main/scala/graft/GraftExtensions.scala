package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension wiring (`spark.sql.extensions=graft.GraftExtensions`
  * or `.withExtensions(new GraftExtensions)`): registers the native SQL
  * functions and the TopKPerGroup planning strategy on every new session —
  * the packaging a deployed library uses instead of per-session attach
  * calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.definitions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // R45: MV auto-rewrite inside the operator-optimization fixed point,
    // so the substituted MV scan gets its own pushdown/pruning passes
    ext.injectOptimizerRule(_ => graft.plans.MvRewriteRule())
    // R63: stats-informed SQL joins — graft-pinned sides whose exact
    // manifest bytes fit the budget get a BROADCAST hint at plan time
    ext.injectOptimizerRule(_ => graft.plans.StatsJoinRule())
  }
}
