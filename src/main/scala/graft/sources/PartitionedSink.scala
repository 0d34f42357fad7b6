package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Period-partitioned parquet sink + pruned re-scan — the physical layout a
  * 100 TB panel would use: `partitionBy(period)` makes every fold-membership
  * filter a PARTITION-PRUNING operation (only the fold's period directories
  * are listed and read; nothing else is even opened). Local demo of the
  * layout the engine assumes at scale.
  */
object PartitionedSink {

  /** Write `df` partitioned by `periodCol` under target/ (idempotent per
    * (session, path)); returns the re-read DataFrame whose period filters
    * prune partitions.
    */
  def writeAndReload(df: DataFrame, periodCol: String, path: String): DataFrame = {
    val spark = df.sparkSession
    val marker = new java.io.File(path, "_SUCCESS")
    if (!marker.exists()) {
      df.write.mode("overwrite").partitionBy(periodCol).parquet(path)
    }
    spark.read.parquet(path)
  }

  /** True iff a filter on the partition column reached the scan as a
    * partition filter (checked from the formatted plan).
    */
  def isPartitionPruned(filtered: DataFrame, periodCol: String): Boolean = {
    val plan = filtered.queryExecution.executedPlan.toString
    plan.contains("PartitionFilters: [") && plan.contains(periodCol)
  }
}
