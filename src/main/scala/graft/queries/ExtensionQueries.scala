package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables
import graft.streaming.StreamingOps

/** Multimodal-plumbing and streaming queries. The multimodal payloads are
  * the documents' text bytes (no real media in the harness tables); the
  * decode stub's arithmetic is deterministic and replicated in the oracle.
  */
object ExtensionQueries extends QueryPack {

  /** documents → opaque media records (utf-8 payload bytes). */
  private def media(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        encode(col("text"), "UTF-8").as("media"),
        lit("text/plain").as("mediaType"))
      .as[Multimodal.MediaRecord]
  }

  private def decodeQ(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decode(media(spark, dir)).toDF()
      .select(col("id"), col("nBytes").as("n_bytes"),
        col("width"), col("height"), col("channels"))

  private def featuresQ(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(media(spark, dir)).toDF()
      .select(col("id"),
        round(aggregate(col("features"), lit(0.0d), (acc, x) => acc + x), 4)
          .as("feature_sum"))

  private def streamQ(spark: SparkSession, dir: String): DataFrame =
    StreamingOps.streamPeriodAgg(spark, dir)

  /** Sessionization via flatMapGroupsWithState (12h gap). */
  private def sessionQ(spark: SparkSession, dir: String): DataFrame =
    StreamingOps.sessionize(spark, dir, gapHours = 12,
      queryName = s"stream_sessions_${math.abs(dir.hashCode)}")

  /** Period-partitioned sink + partition-pruned fold scan: write events
    * partitioned by day under target/, re-read with fold 0's train filter —
    * the physical layout for fold membership at 100 TB. Fails loudly if the
    * filter did NOT reach the scan as a partition filter.
    */
  private def partitionedScanQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.PartitionedSink
    val ev = PanelQueries.events(spark, dir).select("event_id", "value", "period")
    val path = s"target/partitioned/events_${math.abs(dir.hashCode)}"
    val reloaded = PartitionedSink.writeAndReload(ev, "period", path)
    val ps = graft.cv.PanelSplit(reloaded, "period", nSplits = PanelQueries.N_SPLITS, testSize = 1)
    val fold0Train = reloaded.filter(ps.folds.head.trainPredicate("period", None))
      .select(col("event_id"), col("period").cast("date").as("period"), col("value"))
    require(PartitionedSink.isPartitionPruned(fold0Train, "period"),
      "fold filter did not prune partitions")
    fold0Train
  }

  /** Bucketed co-located join: events and per-user totals both bucketed on
    * user_id → sort-merge join + post-join groupBy(user_id) with ZERO
    * shuffle exchanges (asserted at runtime) — the repeated-join layout for
    * entity-keyed panel data at 100 TB.
    */
  private def bucketedJoinQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.PartitionedSink
    val suffix = math.abs(dir.hashCode)
    val ev = PanelQueries.events(spark, dir).select("event_id", "user_id", "value")
    val t1 = PartitionedSink.writeBucketedTable(ev, "user_id", 16,
      s"graft_ev_bucketed_$suffix")
    val totals = ev.groupBy(col("user_id")).agg(sum(col("value")).as("user_total"))
    val t2 = PartitionedSink.writeBucketedTable(totals, "user_id", 16,
      s"graft_user_totals_bucketed_$suffix")
    val joined = t1.hint("merge").join(t2, "user_id")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        round(first(col("user_total")), 4).as("user_total"))
    require(PartitionedSink.isShuffleFree(joined),
      "bucketed join or post-join aggregation introduced a shuffle exchange")
    joined
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_decode" -> (decodeQ _),
    "q_multimodal_features" -> (featuresQ _),
    "q_stream_period_agg" -> (streamQ _),
    "q_stream_sessionize" -> (sessionQ _),
    "q_partitioned_fold_scan" -> (partitionedScanQ _),
    "q_bucketed_join" -> (bucketedJoinQ _),
    "q_stream_dedup" -> ((s, dir) =>
      StreamingOps.streamDedupUsersPerDay(s, dir,
        queryName = s"stream_dedup_${math.abs(dir.hashCode)}")),
  )

  def oracleSql: Map[String, String] = Map(
    "q_multimodal_decode" ->
      // text is ASCII here, so payload bytes = n_chars; first byte = first char
      """SELECT doc_id AS id,
        |  CAST(length(text) AS INT) AS n_bytes,
        |  CAST(64 + length(text) % 512 AS INT) AS width,
        |  CAST(64 + (length(text) * 7) % 512 AS INT) AS height,
        |  CAST(1 + ascii(substr(text, 1, 1)) % 3 AS INT) AS channels
        |FROM documents
        |""".stripMargin,
    // Replicates the stub's exact double arithmetic: per-bucket sequential
    // accumulation of byte/255.0 in increasing position order (i % 16 = j),
    // then a left fold over the 16 buckets — list_reduce preserves both
    // orders, so the compare is bitwise at round-4.
    "q_multimodal_features" ->
      """SELECT doc_id AS id,
        |  round(list_reduce(list_prepend(0.0,
        |    list_transform(range(0, 16), j ->
        |      list_reduce(list_prepend(0.0,
        |        list_transform(
        |          list_filter(range(0, length(text)), i -> i % 16 = j),
        |          i -> ascii(substr(text, i + 1, 1)) / 255.0)),
        |        (a, b) -> a + b))),
        |    (a, b) -> a + b), 4) AS feature_sum
        |FROM documents
        |""".stripMargin,
    "q_stream_period_agg" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS period,
        |  count(*) AS n_events,
        |  round(sum(value), 6) AS sum_value,
        |  round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1
        |""".stripMargin,
    "q_stream_sessionize" ->
      """WITH x AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > CAST(12 AS BIGINT) * 3600 * 1000000 THEN 1
        |         ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
        |s AS (SELECT user_id, ts_us,
        |        CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
        |          ROWS UNBOUNDED PRECEDING) - 1 AS INT) AS session_idx
        |      FROM x)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM s GROUP BY user_id, session_idx
        |""".stripMargin,
    "q_partitioned_fold_scan" ->
      s"""${PanelQueries.prelude}
         |SELECT event_id, period, value FROM ev
         |WHERE pos < (SELECT n FROM nn) - ${PanelQueries.N_SPLITS}
         |""".stripMargin,
    "q_stream_dedup" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS period,
        |       count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1
        |""".stripMargin,
    "q_bucketed_join" ->
      """SELECT user_id, count(*) AS n_events,
        |       round(sum(value), 4) AS sum_value,
        |       round(sum(value), 4) AS user_total
        |FROM events GROUP BY user_id
        |""".stripMargin,
  )
}
