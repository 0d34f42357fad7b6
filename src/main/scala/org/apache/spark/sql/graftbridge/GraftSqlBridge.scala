package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door a custom LogicalPlan needs: wrapping a plan
  * back into a DataFrame. Spark exposes no public constructor for this —
  * every extension library that contributes logical operators (Delta,
  * Iceberg, spark-nlp, …) hosts exactly this bridge in an
  * `org.apache.spark.sql` subpackage. Nothing else reaches through.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
