package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** Structured Streaming extension (SURVEY §7.6 — not a reference
  * capability): the period axis of a panel is maintained incrementally from
  * an event stream via watermarked tumbling-window aggregation; fold
  * (re-)planning happens per micro-batch on the tiny aggregated axis.
  */
object StreamingOps {

  /** Watermarked per-day aggregate of a streaming events source:
    * readStream → window(1 day) → count/sum/avg. `Trigger.AvailableNow`
    * drains the source and terminates, so the same code path serves both
    * backfill and live tailing. Returns the materialized aggregate table.
    */
  def streamPeriodAgg(
      spark: SparkSession,
      dir: String,
      queryName: String = "stream_period_agg"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // schema from a batch peek (ts arrives as raw nanos long)
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema

    // the parquet file-stream source needs a directory; glob-filter the
    // single events file inside the sf dir
    var stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (rawSchema("ts").dataType == LongType)
      stream = stream.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast(LongType)))

    val agg = stream
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"),
        round(avg(col("value")), 6).as("avg_value"))

    val query = agg.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    spark.table(queryName)
      .select(to_date(col("w.start")).as("period"),
        col("n_events"), col("sum_value"), col("avg_value"))
  }
}
