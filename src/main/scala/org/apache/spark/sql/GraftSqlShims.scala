package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan construction — the standard extension
  * seam (Delta, Sedona, Iceberg all ship an equivalent shim): building a
  * DataFrame from a custom [[LogicalPlan]] node has no public constructor,
  * so graft's native operators (e.g. the as-of join plan) place this one
  * object inside the org.apache.spark.sql package.
  */
object GraftSqlShims {

  /** Wrap an analyzed custom logical plan as a DataFrame of `spark`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
