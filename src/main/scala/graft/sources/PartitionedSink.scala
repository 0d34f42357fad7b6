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

  /** Write `df` as a BUCKETED table (hash-bucketed + sorted on `bucketCol`)
    * — the co-location layout for repeated large joins/aggregations on one
    * key at 100 TB: two tables bucketed the same way join with NO shuffle
    * on either side, and a post-join `groupBy` on the key reuses the same
    * distribution. Idempotent per (session, table).
    */
  def writeBucketedTable(df: DataFrame, bucketCol: String, nBuckets: Int, table: String): DataFrame = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      // Pin the write's input distribution to the bucket hash (round-8;
      // guide §6 "coalesce on write" / §2.4 shared exchange): unpinned, the
      // write task layout was whatever AQE left upstream — measured BIMODAL
      // on the sf0.1 prefix-index gate (a post-aggregate input coalesced to
      // ONE task that sorted and wrote all 16 bucket files: 46 s; the same
      // write at 32 input tasks × 16 files each: 6 s and 512 tiny files).
      // repartition(nBuckets, bucketCol) uses exactly the bucket hash, so
      // every task owns whole buckets: stable nBuckets-way parallelism,
      // exactly ONE file per bucket, and the write-side sort runs once per
      // bucket instead of once per (task, bucket).
      df.repartition(nBuckets, col(bucketCol))
        .write.mode("overwrite").format("parquet")
        .option("path", s"target/bucketed/$table")
        .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
        .saveAsTable(table)
    }
    spark.table(table)
  }

  /** True iff the physical plan contains NO shuffle exchange at all —
    * the co-located-join assertion (bucketed reads feed SortMergeJoin
    * directly; only a broadcast exchange, if any, is tolerated).
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
