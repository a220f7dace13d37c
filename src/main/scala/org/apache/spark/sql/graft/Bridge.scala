package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the engine needs: turning a hand-
  * built LogicalPlan (a manifest-backed scan relation) into a public
  * DataFrame. Living inside the `org.apache.spark.sql` namespace is
  * the established pattern for FileIndex-providing libraries — the
  * alternative is reflection, which trades a compile-time pin on the
  * (fixed, vendored) Spark version for a runtime one.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
