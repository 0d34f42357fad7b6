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
        round(aggregate(col("features"),
          lit(0.0d), (acc, x) => acc + x.cast("double")), 4).as("feature_sum"))

  private def streamQ(spark: SparkSession, dir: String): DataFrame =
    StreamingOps.streamPeriodAgg(spark, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_decode" -> (decodeQ _),
    "q_multimodal_features" -> (featuresQ _),
    "q_stream_period_agg" -> (streamQ _),
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
    // q_multimodal_features: float accumulation order inside the stub is
    // partition-local but per-record sequential — replicable in SQL, but
    // float32 rounding differs from DuckDB's DOUBLE math; rows-only check.
    "q_stream_period_agg" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS period,
        |  count(*) AS n_events,
        |  round(sum(value), 6) AS sum_value,
        |  round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1
        |""".stripMargin,
  )
}
