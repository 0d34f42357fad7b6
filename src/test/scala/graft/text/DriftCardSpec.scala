package graft.text

import graft.SparkTestBase

class DriftCardSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def run(old: Seq[(String, String)], nw: Seq[(String, String)]) =
    DriftCard.tokenDrift(
        old.toDF("source", "text"), nw.toDF("source", "text"), "source", "text")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("identical snapshots have zero drift") {
    val docs = Seq("web" -> "a b c a", "web" -> "d e", "books" -> "x y x")
    val got = run(docs, docs)
    assert(got.values.forall(r => r._5 == 0.0 && r._6 == 0.0))
  }

  test("hand-computed smoothed TV and KL") {
    // union vocab {a,b}, V=2, both masses 3, denominators 5:
    // p = (2/5, 3/5), q = (3/5, 2/5) → TV = 1/5 exactly,
    // KL = 0.4·ln(2/3) + 0.6·ln(3/2) with 9-dp-pinned terms
    val got = run(Seq("s" -> "a a b"), Seq("s" -> "a b b"))("s")
    assert(got == (("s", 2L, 3L, 3L, 0.2,
      BigDecimal(0.4 * math.log(2.0 / 3)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .+(BigDecimal(0.6 * math.log(3.0 / 2)).setScale(9, BigDecimal.RoundingMode.HALF_UP))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("disjoint vocabularies give the smoothed extreme") {
    // p = (1/3, 2/3) vs q = (2/3, 1/3): TV = 1/3, KL = ln(2)/3
    val got = run(Seq("s" -> "a"), Seq("s" -> "b"))("s")
    assert(got._5 == BigDecimal(1.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(got._6 - math.log(2.0) / 3) < 2e-6)
  }

  test("a group present in only one snapshot still scores") {
    // (a union vocab of ONE word is a point mass on both sides — zero
    // drift by construction — so the new-only group carries two words)
    val got = run(Seq("s" -> "a b"), Seq("s" -> "a b", "t" -> "c d c"))
    assert(got.keySet == Set("s", "t"))
    assert(got("s")._5 == 0.0)
    val t = got("t")
    assert(t._3 == 0L && t._4 == 3L && t._5 > 0.0)
  }

  test("scores are bitwise invariant to partition layout") {
    val old = (0 until 200).map(i => (s"src${i % 3}", s"w${i % 17} w${i % 5} w${i % 11}"))
    val nw = (0 until 200).map(i => (s"src${i % 3}", s"w${i % 13} w${i % 7}"))
    def collectWith(parts: Int) = DriftCard.tokenDrift(
        old.toDF("source", "text").repartition(parts),
        nw.toDF("source", "text").repartition(parts), "source", "text")
      .as[(String, Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(collectWith(1) == collectWith(7))
  }

  test("per-group totals broadcast back to the vocab axis") {
    val plan = DriftCard.tokenDrift(
        Seq("s" -> "a b").toDF("source", "text"),
        Seq("s" -> "b c").toDF("source", "text"), "source", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
