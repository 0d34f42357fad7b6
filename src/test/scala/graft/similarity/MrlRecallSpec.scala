package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MrlRecallSpec extends SparkTestBase {
  import spark.implicits._

  // 8-dim vectors whose PREFIX (first 4 dims) already separates the two
  // clusters; suffix carries fine detail that reorders within a cluster
  private def vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f, 0.9f, 0f, 0f, 0f)),
    (1L, Array(1f, 0.1f, 0f, 0f, 0.1f, 0f, 0f, 0f)),
    (2L, Array(0.9f, 0f, 0.1f, 0f, 0.85f, 0f, 0f, 0f)),
    (3L, Array(0f, 1f, 0f, 0f, 0f, 0.9f, 0f, 0f)),
    (4L, Array(0f, 1f, 0.1f, 0f, 0f, 0.1f, 0f, 0f)),
    (5L, Array(0f, 0.9f, 0f, 0.1f, 0f, 0.8f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("mrl funnel with refine = corpus equals brute force exactly") {
    val q = vecs.filter(col("vec_id") < 2)
    val exact = Similarity.bruteForceTopK(q, vecs, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(t => (t._1, t._3))
    val mrl = Similarity.mrlTopK(q, vecs, "vec_id", "embedding", 3,
        prefixDims = 4, refine = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(t => (t._1, t._3))
    assert(mrl.toSeq == exact.toSeq)
  }

  test("mrl shortlist confines to the prefix cluster; refine re-ranks within it") {
    // query 0's prefix cluster is {1, 2}; with refine = 2 the funnel can
    // only return those, re-ranked by FULL cosine (2's matching suffix
    // beats 1's despite prefix parity)
    val q = vecs.filter(col("vec_id") === 0)
    val out = Similarity.mrlTopK(q, vecs, "vec_id", "embedding", 2,
        prefixDims = 4, refine = 2)
      .collect().map(r => (r.getInt(3), r.getLong(1))).sorted
    assert(out.map(_._2).toSet == Set(1L, 2L), s"left the prefix cluster: ${out.toSeq}")
    assert(out.head._2 == 2L, "full-dim refine must prefer the suffix match")
  }

  test("recallAtK: hand-built hit/miss ledger") {
    val exact = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3),
      (1L, 20L, 1), (1L, 21L, 2), (1L, 22L, 3))
      .toDF("query_id", "neighbor_id", "rnk")
    val approx = Seq((0L, 10L, 1), (0L, 99L, 2), (0L, 12L, 3),
      (1L, 20L, 1), (1L, 21L, 2), (1L, 22L, 3))
      .toDF("query_id", "neighbor_id", "rnk")
    val out = Similarity.recallAtK(approx, exact, 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((3L, 2L, 0.666667)))
    assert(out(1L) == ((3L, 3L, 1.0)))
  }

  test("recallAtK ignores rows past k on either side") {
    val exact = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3)).toDF("query_id", "neighbor_id", "rnk")
    val approx = Seq((0L, 3L, 1), (0L, 2L, 2), (0L, 1L, 3)).toDF("query_id", "neighbor_id", "rnk")
    val out = Similarity.recallAtK(approx, exact, 2).collect().head
    // exact top-2 = {1,2}; approx top-2 = {3,2} -> 1 hit of 2
    assert(out.getLong(1) == 2L && out.getLong(2) == 1L && out.getDouble(3) == 0.5)
  }
}
