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

  /** Event projected for sessionization: micros keep the gap arithmetic in
    * exact integer math (identical in the DuckDB oracle via epoch_us).
    */
  final case class UserEvent(user_id: Long, ts_us: Long)
  final case class UserSession(
      user_id: Long, session_idx: Int, n_events: Long, start_us: Long, end_us: Long)

  /** Stateful sessionization over the event stream:
    * `groupByKey(user).flatMapGroupsWithState` — a session breaks when the
    * gap between consecutive events exceeds `gapHours`. With
    * `Trigger.AvailableNow` the whole history arrives as one batch per
    * group; on a live stream the same function holds the open session in
    * `GroupState` across batches.
    */
  def sessionize(spark: SparkSession, dir: String, gapHours: Int = 12,
      queryName: String = "stream_sessions"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema

    var stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (rawSchema("ts").dataType == LongType)
      stream = stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))

    val gapUs = gapHours.toLong * 3600L * 1000000L
    val events = stream.select(col("user_id"), unix_micros(col("ts")).as("ts_us")).as[UserEvent]

    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Long], UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[List[Long]]) =>
          // fold this batch's events into the carried timestamps, sessionize
          val ts = (state.getOption.getOrElse(Nil) ++ it.map(_.ts_us)).sorted
          state.update(ts) // keep everything; AvailableNow = single batch
          var idx = -1
          var prev = Long.MinValue
          val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
          ts.foreach { t =>
            if (prev == Long.MinValue || t - prev > gapUs) idx += 1
            out += ((idx, t))
            prev = t
          }
          out.groupBy(_._1).map { case (i, xs) =>
            UserSession(uid, i, xs.size.toLong, xs.map(_._2).min, xs.map(_._2).max)
          }.toSeq.sortBy(_.session_idx).iterator
      }

    val query = sessions.writeStream
      .format("memory").queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark.table(queryName)
  }

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
      stream = stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))

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
