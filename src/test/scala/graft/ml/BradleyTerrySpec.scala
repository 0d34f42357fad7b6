package graft.ml

import graft.SparkTestBase

class BradleyTerrySpec extends SparkTestBase {
  import spark.implicits._

  private def fitMap(comps: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val df = comps.toDF("winner", "loser")
    BradleyTerry.fit(BradleyTerry.pairCounts(df, "winner", "loser"), iters)
      .collect().map(r => r.getLong(0) -> r.getDecimal(3).doubleValue()).toMap
  }

  test("two players: strengths converge to the 3:1 win-odds MLE") {
    // A beats B 3×, B beats A 1× → MLE γA/γB = 3; mean-1 scale → 1.5 / 0.5
    val comps = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L))
    val g = fitMap(comps, 12)
    assert(math.abs(g(1L) - 1.5) < 1e-3, s"γA = ${g(1L)}")
    assert(math.abs(g(2L) - 0.5) < 1e-3, s"γB = ${g(2L)}")
  }

  test("balanced wins give equal strengths at exactly 1") {
    val comps = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L))
    val g = fitMap(comps, 5)
    assert(g.values.forall(v => math.abs(v - 1.0) < 1e-6), g.toString)
  }

  test("a dominance chain orders strengths") {
    // A > B (4-1), B > C (4-1), A > C (4-1)
    def rep(w: Long, l: Long) = Seq.fill(4)((w, l)) :+ ((l, w))
    val comps = rep(1L, 2L) ++ rep(2L, 3L) ++ rep(1L, 3L)
    val g = fitMap(comps, 10)
    assert(g(1L) > g(2L) && g(2L) > g(3L), g.toString)
  }

  test("pairCounts canonicalizes and counts both directions") {
    val df = Seq((5L, 2L), (2L, 5L), (5L, 2L)).toDF("winner", "loser")
    val p = BradleyTerry.pairCounts(df, "winner", "loser").collect().head
    assert(p.getLong(0) == 2L && p.getLong(1) == 5L)
    assert(p.getLong(2) == 3L && p.getLong(3) == 1L) // lo=2 won once
  }

  test("strengths stay mean-1 normalized") {
    val comps = Seq((1L, 2L), (1L, 2L), (3L, 2L), (1L, 3L), (2L, 3L))
    val g = fitMap(comps, 6)
    assert(math.abs(g.values.sum / g.size - 1.0) < 1e-5)
  }
}
