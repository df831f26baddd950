package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame bridge (`Dataset.ofRows` is `private[sql]`).
  *
  * Lets tests execute a SUBTREE of an audited plan — e.g. PlanAuditSpec
  * materializes the child of every unpartitioned Window to prove the
  * frame under it is k-row bounded, instead of trusting an allowlist. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
