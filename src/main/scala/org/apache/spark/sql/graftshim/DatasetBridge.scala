package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Second (and last) access shim next to [[ColumnBridge]]:
  * `Dataset.ofRows` is `private[sql]` in Spark 4's classic module,
  * and it is the only way to hand a custom [[LogicalPlan]] node (the
  * merge as-of join) to the session's analyzer/optimizer/planner
  * pipeline. Standard pattern for Catalyst-extending libraries.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
