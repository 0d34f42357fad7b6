package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.hash60

/** Size-targeted release sharding (beyond-reference training-data op):
  * assign every document a shard id such that each shard's byte mass lands
  * on ~`targetBytes`, deterministically, WITHOUT a global sort — the
  * release-layout step between curation and `writeWet`/parquet export
  * (training infra wants shards of uniform byte size, not uniform doc
  * count: doc length is Zipf-ish and count-balanced shards skew 10× in
  * bytes).
  *
  * Layout order is the [[CorpusShuffle]] two-stage shape: documents order
  * by (hash bucket, hash, id) — a pseudo-random but PURE-FUNCTION-of-id
  * order, which release sharding wants anyway (each shard becomes an
  * unbiased corpus mix, so a single-shard smoke-train is representative).
  * Per-bucket byte totals are one bounded aggregate (≤ nBuckets rows
  * shuffled, ≤ nBuckets scalars to the driver); bucket base offsets are a
  * driver prefix sum; within-bucket running bytes come from a window
  * partitioned BY BUCKET (sort unit = corpus/nBuckets, tunable to executor
  * memory). shard = ⌊bytes_before / targetBytes⌋ — contiguous byte
  * intervals, so every shard's mass is within one document of the target
  * (spec-asserted), and the assignment replays exactly in SQL as a global
  * running sum.
  */
object ShardAssign {

  /** Adds `shard` (long) and `bytes_before` (long, the doc's start offset
    * in the virtual concatenation — the manifest key downstream writers
    * use). NULL byte sizes are corrupt input and fail loudly.
    */
  def assignShards(
      df: DataFrame,
      idCol: String,
      bytesExpr: Column,
      targetBytes: Long,
      seed: String = "0",
      nBuckets: Int = 1024): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    val bytes = when(bytesExpr.isNull,
        raise_error(concat(lit("assignShards: null byte size for id "),
          col(idCol).cast("string"))))
      .otherwise(bytesExpr.cast("long"))
    val hashed = df
      .withColumn("__bytes", bytes)
      .withColumn("__h", hash60(concat(lit(seed), lit("#"), col(idCol).cast("string"))))
      .withColumn("__bucket", pmod(col("__h"), lit(nBuckets.toLong)).cast("int"))
    val totals = hashed.groupBy(col("__bucket")).agg(sum(col("__bytes")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = {
      var acc = 0L
      totals.map { case (b, t) => val o = (b, acc); acc += t; o }
    }
    val offDf = offsets.toSeq.toDF("__bucket", "__off")
    val w = Window.partitionBy(col("__bucket")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hashed
      .join(broadcast(offDf), Seq("__bucket"))
      .withColumn("bytes_before", col("__off") + sum(col("__bytes")).over(w) - col("__bytes"))
      .withColumn("shard", expr(s"bytes_before div ${targetBytes}L"))
      .drop("__bytes", "__h", "__bucket", "__off")
  }

  /** Shard manifest: per-shard doc count and byte mass, ordered. */
  def shardManifest(assigned: DataFrame, bytesExpr: Column): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(bytesExpr.cast("long")).as("bytes"))
      .orderBy(col("shard"))
}
