package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.Similarity

class StreamSemanticSpec extends SparkTestBase {

  test("streamSemanticScreen union equals the one-shot batch screen") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.streamSemanticScreen(spark, dir,
      threshold = 0.4, queryName = "sem_spec")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val batch = Similarity.screenSemantic(
      e.filter(col("vec_id") % 20 =!= 0), e.filter(col("vec_id") % 20 === 0),
      "vec_id", "embedding", threshold = 0.4)
      .withColumnRenamed("id", "vec_id")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty, "streamed rows missing from batch")
    assert(batch.exceptAll(streamed).isEmpty, "batch rows missing from stream")
  }
}
