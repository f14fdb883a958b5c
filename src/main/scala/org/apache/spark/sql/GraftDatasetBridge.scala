package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame bridge: Spark 4 scopes `Dataset.ofRows`
  * private[sql], so custom logical operators (graft.plans) need this
  * one-hop inside the sql package to surface as user-facing frames —
  * the plan-level sibling of [[GraftColumnBridge]]. */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
