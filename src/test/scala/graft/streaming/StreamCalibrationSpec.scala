package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StreamCalibrationSpec extends SparkTestBase {

  test("streamed reliability bins equal the one-shot batch computation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.streamCalibration(spark, dir, bins = 10,
      queryName = "calib_spec")
    val events = graft.sources.Tables.cached(spark, dir, "events")
    val thr = events.agg(avg(col("value"))).collect().head.getDouble(0)
    val p = lit(1.0) / (lit(1.0) + exp(-(col("value") - lit(thr)) / lit(10.0)))
    val batch = events
      .select(least(floor(p * 10), lit(9)).cast("int").as("bin"),
        p.as("p"), (col("event_id") % 2).cast("double").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_bin"),
        round(avg(col("p")), 6).as("conf"), round(avg(col("y")), 6).as("acc"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty, "streamed bins missing from batch")
    assert(batch.exceptAll(streamed).isEmpty, "batch bins missing from stream")
  }
}
