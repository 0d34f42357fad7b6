package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SilhouetteSpec extends SparkTestBase {
  import spark.implicits._

  private val DIM = 8

  // two tight clusters on orthogonal axes plus one far outlier that still
  // assigns (max dot) to the first cluster's centroid direction
  private def vecs = Seq(
    (0L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (1L, Array(0.95f, 0.05f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (2L, Array(1.05f, 0f, 0.05f, 0f, 0f, 0f, 0f, 0f)),
    (3L, Array(0f, 0f, 0f, 0f, 1.0f, 0f, 0f, 0f)),
    (4L, Array(0f, 0.05f, 0f, 0f, 0.95f, 0f, 0f, 0f)),
    (5L, Array(0f, 0f, 0f, 0.05f, 1.05f, 0f, 0f, 0f)),
    (6L, Array(9.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("well-separated clusters score a positive mean silhouette everywhere") {
    // without the planted outlier: two tight orthogonal clusters
    val clean = vecs.filter(col("vec_id") < 6)
    val out = Silhouette.simplifiedSilhouette(clean, "vec_id", "embedding",
        nLists = 2, dim = DIM, iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._2).sum == 6L, "every vector lands in exactly one cluster")
    assert(out.forall(r => r._3 >= -1.0 && r._3 <= 1.0), s"silhouette out of [-1,1]: ${out.toSeq}")
    assert(out.forall(_._3 > 0.0), s"separated clusters must score > 0: ${out.toSeq}")
  }

  test("a planted far outlier drags its cluster's mean silhouette down") {
    def sil(df: org.apache.spark.sql.DataFrame) =
      Silhouette.simplifiedSilhouette(df, "vec_id", "embedding",
          nLists = 2, dim = DIM, iters = 2)
        .collect().map(r => r.getDouble(2)).min
    assert(sil(vecs) < sil(vecs.filter(col("vec_id") < 6)),
      "the corrupted cluster must score below every clean cluster")
  }

  test("single cluster scores exactly 0 when b has no other centroid to beat a") {
    // nLists = 2 but all mass on one axis: one centroid keeps its init and
    // silhouette stays finite (b = distance to the stale empty centroid)
    val one = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (1L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Silhouette.simplifiedSilhouette(one, "vec_id", "embedding",
        nLists = 2, dim = DIM, iters = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).sum == 2L)
    out.foreach { case (_, s) => assert(!s.isNaN && s >= -1.0 && s <= 1.0) }
  }

  test("outlier screen flags the planted far point and nothing degenerate") {
    val out = Silhouette.outlierScreen(vecs, "vec_id", "embedding",
        nLists = 2, dim = DIM, iters = 2, zThr = 1.2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(out.length == 7)
    assert(out.forall(r => !r._3.isNaN && !r._4.isNaN))
    val flagged = out.filter(_._5).map(_._1)
    assert(flagged.contains(6L), s"the planted outlier must flag: ${out.toSeq}")
    // flag is exactly z > thr, no side channel
    assert(out.forall(r => r._5 == (r._4 > 1.2)))
    // the outlier carries the max z in its cluster
    val cl6 = out.find(_._1 == 6L).get._2
    assert(out.filter(_._2 == cl6).maxBy(_._4)._1 == 6L)
  }

  test("identical points in a cluster yield sd = 0 and z = 0, never NaN") {
    val same = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (1L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(0f, 0f, 0f, 0f, 1.0f, 0f, 0f, 0f)),
      (3L, Array(0f, 0f, 0f, 0f, 1.0f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Silhouette.outlierScreen(same, "vec_id", "embedding",
        nLists = 2, dim = DIM, iters = 2, zThr = 2.0)
      .collect().map(r => (r.getDouble(3), r.getBoolean(4)))
    assert(out.forall { case (z, f) => z == 0.0 && !f })
  }

  test("report axis is the cluster set: counts reconcile with assignments") {
    val rep = Silhouette.simplifiedSilhouette(vecs, "vec_id", "embedding",
        nLists = 4, dim = DIM, iters = 2)
      .agg(sum("n_vecs")).collect().head.getLong(0)
    assert(rep == 7L)
  }
}
