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
    * exact integer math (identical in the DuckDB oracle via epoch_us); the
    * timestamp column is carried for the event-time watermark.
    */
  final case class UserEvent(user_id: Long, ts_us: Long, ts: java.sql.Timestamp)
  final case class UserSession(
      user_id: Long, session_idx: Int, n_events: Long, start_us: Long, end_us: Long)

  /** Bounded per-user session state: ONLY the open session (index, count,
    * bounds) — O(1) per user, never the event history. `n_events == 0`
    * marks a closed-by-timeout tombstone that preserves the session index
    * for numbering continuity when the user reappears.
    */
  final case class OpenSession(session_idx: Int, n_events: Long, start_us: Long, last_us: Long)

  /** Streaming sessionization transform with bounded state: closed sessions
    * emit as soon as they close — either when a later event exceeds the gap
    * inside a batch, or via event-time timeout once the watermark passes
    * (last event + gap). `GroupState` holds a single [[OpenSession]];
    * state size is independent of session length or history.
    *
    * Late events (behind the watermark) follow the standard stateful
    * contract: they fold into the open session if one exists, but a session
    * already closed by timeout stays closed.
    */
  def sessionizeStream(
      events: org.apache.spark.sql.Dataset[UserEvent],
      gapUs: Long): org.apache.spark.sql.Dataset[UserSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is closed.
            // Keep a zero-count tombstone so a reappearing user continues
            // the session numbering instead of restarting at 0.
            val o = state.get
            state.update(OpenSession(o.session_idx + 1, 0L, 0L, o.last_us))
            Iterator(UserSession(uid, o.session_idx, o.n_events, o.start_us, o.last_us))
          } else {
            val ts = it.map(_.ts_us).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[UserSession]
            var open: Option[OpenSession] = state.getOption
            ts.foreach { t =>
              open match {
                case Some(o) if o.n_events == 0L => // tombstone: start fresh at carried idx
                  open = Some(OpenSession(o.session_idx, 1L, t, t))
                case Some(o) if t - o.last_us > gapUs =>
                  closed += UserSession(uid, o.session_idx, o.n_events, o.start_us, o.last_us)
                  open = Some(OpenSession(o.session_idx + 1, 1L, t, t))
                case Some(o) =>
                  open = Some(o.copy(n_events = o.n_events + 1, last_us = math.max(o.last_us, t)))
                case None =>
                  open = Some(OpenSession(0, 1L, t, t))
              }
            }
            open.foreach { o =>
              state.update(o)
              if (o.n_events > 0L) {
                val timeoutMs = o.last_us / 1000L + gapUs / 1000L
                state.setTimeoutTimestamp(math.max(timeoutMs, state.getCurrentWatermarkMs() + 1))
              }
            }
            closed.iterator
          }
      }
  }

  /** Drain-mode sessionization over the events table: the streaming
    * transform above under `Trigger.AvailableNow` emits every session the
    * watermark can close (in-batch gaps + the final no-data batch's
    * timeouts); the still-open tail sessions — at most one per user, since
    * any earlier session's successor event forces its timeout before the
    * final watermark — are recovered by a deterministic batch finalize:
    * events after each user's last closed session form exactly the open
    * session. Output is identical to the full-history batch oracle.
    */
  def sessionize(spark: SparkSession, dir: String, gapHours: Int = 12,
      queryName: String = "stream_sessions"): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema

    var stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (rawSchema("ts").dataType == LongType)
      stream = stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))

    val gapUs = gapHours.toLong * 3600L * 1000000L
    val events = stream
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[UserEvent]

    val query = sessionizeStream(events, gapUs).writeStream
      .format("memory").queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    // batch finalize: per user, the event tail after the last closed session
    // is the (single) still-open session
    val closed = spark.table(queryName)
    val lastClosed = closed.groupBy(col("user_id"))
      .agg(max(col("end_us")).as("__last_end"), max(col("session_idx")).as("__last_idx"))
    val batchEvents = {
      var df = spark.read.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      if (rawSchema("ts").dataType == LongType)
        df = df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      df.select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    }
    val open = batchEvents.join(lastClosed, Seq("user_id"), "left")
      .filter(col("__last_end").isNull || col("ts_us") > col("__last_end"))
      .groupBy(col("user_id"))
      .agg(
        coalesce(first(col("__last_idx")) + 1, lit(0)).cast("int").as("session_idx"),
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
    closed.unionByName(open.select("user_id", "session_idx", "n_events", "start_us", "end_us"))
  }

  /** Streaming exact dedup with WATERMARK-BOUNDED state:
    * `dropDuplicatesWithinWatermark` keeps a (user, day) key in state only
    * until the event-time watermark passes its eviction point — the
    * streaming analog of exact content-hash dedup for continuously
    * arriving training data. Emitted rows are the first occurrence per
    * key; the per-day distinct-user aggregate over the drained sink is
    * deterministic regardless of arrival order. A day's events span < 24h,
    * so a 1-day delay makes the windowed dedup exact for this keying.
    */
  def streamDedupUsersPerDay(
      spark: SparkSession,
      dir: String,
      queryName: String = "stream_dedup"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    var stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (rawSchema("ts").dataType == LongType)
      stream = stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))

    val deduped = stream
      .withColumn("period", to_date(col("ts")))
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("user_id", "period")
      .select(col("user_id"), col("period"))

    val query = deduped.writeStream
      .format("memory").queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    spark.table(queryName)
      .groupBy(col("period"))
      .agg(count(lit(1)).as("n_users"))
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
