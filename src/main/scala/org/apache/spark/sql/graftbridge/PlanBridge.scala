package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the engine needs: turning a custom
  * logical plan (graft.plans.AsOfJoin) into a DataFrame. `Dataset.ofRows`
  * is `private[sql]`, so this object lives under the org.apache.spark.sql
  * namespace — the standard technique Spark-extension libraries use; it
  * contains no Spark code, only the delegation below.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
