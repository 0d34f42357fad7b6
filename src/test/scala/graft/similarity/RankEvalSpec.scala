package graft.similarity

import graft.SparkTestBase

class RankEvalSpec extends SparkTestBase {
  import spark.implicits._

  private def g(i: Int): Double = RankEval.gain(i)

  private def run(exact: Seq[(Long, Long, Int)], approx: Seq[(Long, Long, Int)], k: Int) =
    RankEval.rankEval(
      approx.toDF("query_id", "neighbor_id", "rnk"),
      exact.toDF("query_id", "neighbor_id", "rnk"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)

  test("perfect ranking scores ndcg = 1 and mrr = 1") {
    val lst = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
    val out = run(lst, lst, 3)
    assert(out.toSeq == Seq((0L, 3L, 1.0, 1.0)))
  }

  test("reversed ranking: ndcg from hand-computed gains, mrr = 1/k") {
    val exact = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
    val approx = Seq((0L, 12L, 1), (0L, 11L, 2), (0L, 10L, 3))
    // all three true neighbors present: under binary relevance a full
    // permutation occupies the same position set {1,2,3}, so dcg sums the
    // same three gains as idcg and ndcg = 1; mrr = 1/3 (the true rank-1
    // neighbor 10 sits at approx position 3)
    val out = run(exact, approx, 3)
    assert(out.head._3 == 1.0)
    assert(out.head._4 == BigDecimal(1.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("partial hit: only the true #2 found, at approx position 1") {
    val exact = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
    val approx = Seq((0L, 11L, 1), (0L, 99L, 2), (0L, 98L, 3))
    val want = BigDecimal(g(1) / (g(1) + g(2) + g(3)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = run(exact, approx, 3)
    assert(out.head._3 == want)
    assert(out.head._4 == 0.0, "true nearest neighbor missed → mrr = 0")
  }

  test("n_true < k divides idcg by what the exact head returned") {
    val exact = Seq((0L, 10L, 1), (0L, 11L, 2))
    val approx = Seq((0L, 10L, 1), (0L, 99L, 2), (0L, 98L, 3))
    val want = BigDecimal(g(1) / (g(1) + g(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = run(exact, approx, 3)
    assert(out.head._2 == 2L)
    assert(out.head._3 == want)
    assert(out.head._4 == 1.0)
  }

  test("multiple queries stay independent") {
    val exact = Seq((0L, 10L, 1), (1L, 20L, 1))
    val approx = Seq((0L, 10L, 1), (1L, 21L, 1))
    val out = run(exact, approx, 1)
    assert(out.toSeq == Seq((0L, 1L, 1.0, 1.0), (1L, 1L, 0.0, 0.0)))
  }

  test("approx rows beyond k are ignored") {
    val exact = Seq((0L, 10L, 1))
    val approx = Seq((0L, 11L, 1), (0L, 10L, 2))
    val out = run(exact, approx, 1)
    assert(out.toSeq == Seq((0L, 1L, 0.0, 0.0)))
  }
}
