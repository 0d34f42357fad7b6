package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StreamDriftSpec extends SparkTestBase {

  test("streamed drift card equals the one-shot batch card row for row") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.streamDriftCard(spark, dir, queryName = "drift_spec")
    val d = graft.sources.Tables.cached(spark, dir, "documents")
    val batch = graft.text.DriftCard.tokenDrift(
      d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
      "source", "text")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty, "streamed rows missing from batch")
    assert(batch.exceptAll(streamed).isEmpty, "batch rows missing from stream")
  }
}
