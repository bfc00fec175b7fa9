package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.GraftFunctions

/** `spark.sql.extensions=graft.GraftExtensions` injects the engine's SQL
  * functions into every session built with the config — the deployment
  * story for a shared cluster (SURVEY.md §2.10). Local sessions that the
  * driver constructs without the config get the same functions via
  * `GraftFunctions.ensureRegistered`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // the engine's whole-operator extension: plans graft.plans.AsOfJoin
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
