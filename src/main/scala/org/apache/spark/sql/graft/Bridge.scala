package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` doorway the custom-plan ladder needs: wrap a
  * hand-built [[LogicalPlan]] (e.g. [[graft.plans.TopKPerGroup]]) back
  * into a user-facing DataFrame so it flows through the normal
  * analyzer → optimizer → planner pipeline. Lives under
  * `org.apache.spark.sql` solely for access; contains no logic.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
