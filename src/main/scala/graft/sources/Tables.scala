package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Harness-table loader. The only wrinkle: `events.ts` has shipped in two
  * parquet flavors across driver data generations, and both must normalize
  * to a session-TZ TIMESTAMP so `unix_micros`/watermarks work and DuckDB
  * (which reads either flavor as a naive timestamp) sees identical values
  * under the UTC sessions every entry point pins:
  *
  *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright
  *    ([PARQUET_TYPE_ILLEGAL]) — read nanos as raw longs
  *    (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a microsecond
  *    timestamp, lossless for this data.
  *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
  *    TIMESTAMP_NTZ by default, which watermarks and `unix_micros` reject —
  *    disable `spark.sql.parquet.inferTimestampNTZ.enabled` so it reads as
  *    TIMESTAMP (same bits interpreted in the UTC session, exactly
  *    DuckDB's view of the naive column).
  */
object Tables {

  /** Parquet-reader confs normalizing both harness timestamp flavors; must
    * run before ANY events scan or stream-schema inference in the session.
    */
  def tsConf(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    tsConf(spark)
    var df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df = df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // Input-parallelism guard (round-7; guide §2.5 "input skew: one file"):
    // each harness table ships as ONE parquet file under the 128 MB split
    // size, so every scan — and every downstream chain until the first
    // exchange — ran as a single task. Repartition to the session's default
    // parallelism, but ONLY when the scan has fewer partitions than cores
    // and the file is non-trivial: on a real multi-file table the condition
    // is false and the plan is untouched, so this is scale-adaptive, not a
    // local tuning constant. Round-robin is deterministic under retries
    // (sortBeforeRepartition is on by default), and the one-time exchange
    // is amortized by the session cache for `cached` tables.
    val par = spark.sparkContext.defaultParallelism
    val fileBytes = scala.util.Try(
      new java.io.File(s"$dir/$name.parquet").length).getOrElse(Long.MaxValue)
    if (fileBytes > (1L << 20) && df.rdd.getNumPartitions < par)
      df.repartition(par)
    else df
  }

  /** Session-scoped cached table handle: repeated driver-contract queries
    * over the same sf dir share one in-memory copy instead of re-scanning
    * parquet per query. Cache key is (session, dir, name); `persist` is
    * lazy so unused tables cost nothing.
    */
  private val cacheReg = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  def cached(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = s"${System.identityHashCode(spark)}|$dir|$name"
    cacheReg.computeIfAbsent(key, _ => load(spark, dir, name).persist())
  }

  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
