package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface: constructing a DataFrame
  * from a custom `LogicalPlan` (`Dataset.ofRows`) has no public
  * equivalent, and every Spark extension library ships a shim like this
  * one. Nothing else crosses the boundary.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
