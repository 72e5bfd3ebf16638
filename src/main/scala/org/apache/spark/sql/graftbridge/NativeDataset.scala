package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]` access bridge for constructing a `DataFrame` from a
  * custom `LogicalPlan` (`Dataset.ofRows`) and reading a frame's
  * analyzed plan — needed by [[graft.plans.TopK]] to splice the native
  * top-k operator into a user's plan. Lives under
  * `org.apache.spark.sql` purely to satisfy the access qualifier (same
  * contract as [[NativeColumn]]); adds no behavior.
  */
object NativeDataset {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def planOf(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
