package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor so graft's
  * custom logical operators (e.g. [[graft.plans.TopKPerKeyNode]]) can be
  * exposed through the public DataFrame API — the standard technique for
  * out-of-tree Spark operator libraries. Nothing else reaches into
  * Spark internals. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
