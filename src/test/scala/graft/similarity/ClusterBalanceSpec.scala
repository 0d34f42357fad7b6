package graft.similarity

import graft.SparkTestBase

class ClusterBalanceSpec extends SparkTestBase {
  import spark.implicits._

  // 60 vectors in 4-dim space, deliberately lopsided: 48 near e1 (one
  // dominant topic), 12 spread near e2 — clusterBalance must cap the
  // dominant cluster at the uniform share and keep the niche whole
  private def vecs = ((0 until 48).map { i =>
    (i.toLong, Array(1f, 0.01f * (i % 7), 0f, 0f))
  } ++ (48 until 60).map { i =>
    (i.toLong, Array(0f, 1f, 0.01f * (i % 5), 0f))
  }).toDF("vec_id", "embedding")

  private def report = Similarity.clusterBalance(vecs, "vec_id", "embedding",
    nLists = 2, dim = 4, iters = 2)

  test("docs conserved, rates in (0,1], kept bounded by rate semantics") {
    val rows = report.collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._1).sum == 60L, s"assignment lost docs: ${rows.toSeq}")
    assert(rows.forall { case (_, rate, _) => rate > 0 && rate <= 1.0 })
    // a full-rate cluster keeps everything; capped clusters keep fewer
    rows.foreach { case (n, rate, kept) =>
      if (rate == 1.0) assert(kept == n, s"full-rate cluster dropped docs")
      else assert(kept <= n && rate < 1.0)
    }
    // the lopsided fixture must actually engage the cap somewhere
    assert(rows.exists(_._2 < 1.0), s"cap never engaged: ${rows.toSeq}")
    assert(rows.exists(_._2 == 1.0), s"no cluster kept whole: ${rows.toSeq}")
  }

  test("deterministic: two runs agree row for row") {
    val a = report.collect().map(_.toSeq).sortBy(_.head.toString)
    val b = report.collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
  }
}
