package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into the `private[sql]` `Dataset.ofRows` so a test can turn
  * a SUBTREE of a query's optimized logical plan back into an
  * executable DataFrame — used by PlanAuditSpec to COUNT the rows
  * feeding each allowlisted global window (the frame one task must
  * hold), turning "this frame is domain-bounded" docstrings into
  * measured assertions. Same session-extension-library pattern as
  * [[ColumnBridge]].
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
