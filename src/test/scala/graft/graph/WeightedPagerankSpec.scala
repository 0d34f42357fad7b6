package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WeightedPagerankSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  test("uniform weights reproduce unweighted pagerank bitwise") {
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"))
    val un = LinkGraph.pagerank(edges.toDF("src", "dst"), "src", "dst", 4)
      .select("node", "rank").as[(String, Double)].collect().toMap
    val w = LinkGraph.weightedPagerank(
        edges.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"),
        "src", "dst", "w", 4)
      .select("node", "rank").as[(String, Double)].collect().toMap
    assert(un == w)
  }

  test("hand-computed weighted round") {
    // a →(3) b, a →(1) c: a's rank 1/3 splits 0.75/0.25;
    // round 1: rank(b) = round(0.05 + 0.85·round(r_a·3/4, 9), 9)
    val got = LinkGraph.weightedPagerank(
        Seq(("a", "b", 3L), ("a", "c", 1L)).toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 1)
      .select("node", "rank").as[(String, Double)].collect().toMap
    def r9(d: Double) = BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r0 = r9(1.0 / 3)
    val base = r9((1.0 - 0.85) / 3)
    assert(got("b") == r9(base + 0.85 * r9(r0 * 3 / 4)))
    assert(got("c") == r9(base + 0.85 * r9(r0 * 1 / 4)))
    assert(got("a") == base) // no in-edges
  }

  test("duplicate edges collapse by weight sum; heavy target outranks light") {
    // two parallel a→b rows (2+3=5) vs one a→c (1)
    val got = LinkGraph.weightedPagerank(
        Seq(("a", "b", 2L), ("a", "b", 3L), ("a", "c", 1L)).toDF("src", "dst", "w"),
        "src", "dst", "w", 3)
      .select("node", "out_weight", "rank")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a")._2 == 6L)
    assert(got("b")._3 > got("c")._3)
  }

  test("non-positive weight raises with the offending edge") {
    val ex = intercept[Exception] {
      LinkGraph.weightedPagerank(
        Seq(("a", "b", 0L)).toDF("src", "dst", "w"), "src", "dst", "w", 1)
        .collect()
    }
    assert(ex.getMessage.contains("non-positive weight"))
  }
}
