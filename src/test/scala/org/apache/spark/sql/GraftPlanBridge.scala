package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset, SparkSession => CSparkSession}

/** Test-only bridge into `private[sql]` plan construction: PlanShapeSpec's
  * unpartitioned-window sweep needs to COUNT the input of a `Window` node
  * it found inside an optimized plan, which means wrapping an arbitrary
  * `LogicalPlan` back into a runnable DataFrame. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): CDataFrame =
    Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** Wrap a catalyst `Expression` from a collected plan node back into a
    * user-facing `Column` (the partitioned-window group-size sweep
    * groups a window's input BY the window's own partitionSpec). */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column = classic.ExpressionUtils.column(e)
}
