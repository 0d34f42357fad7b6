package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Harness-table loader. The only wrinkle: `events.ts` is written as parquet
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright
  * ([PARQUET_TYPE_ILLEGAL]). We read nanos as raw longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a microsecond
  * timestamp — lossless for this data and bit-identical to what DuckDB's
  * date_trunc sees at month granularity.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    var df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df = df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    df
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
