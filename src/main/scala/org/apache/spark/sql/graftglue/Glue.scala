package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one sanctioned crack in the `private[sql]` wall: wrapping a custom
  * logical node ([[graft.plans.TopKPerKey]]) back into a DataFrame needs
  * `Dataset.ofRows`, which Spark scopes to its own package — every engine
  * extension that adds an operator (Delta, Iceberg, Hudi all do exactly
  * this) ships the same two-line bridge in an `org.apache.spark.sql`
  * subpackage. Nothing else may go through here.
  */
object Glue {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
