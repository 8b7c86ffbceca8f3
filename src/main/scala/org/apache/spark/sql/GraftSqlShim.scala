package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: build a DataFrame from a custom
  * LogicalPlan (Dataset.ofRows is private[sql] in Spark 4's classic
  * module). Standard pattern for third-party Catalyst extensions. */
object GraftSqlShim {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
