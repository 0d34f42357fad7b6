package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MarginMineSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
      math.sqrt(b.map(x => x.toDouble * x).sum))
  }
  private def r6(d: Double): BigDecimal =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("margin overrules raw cosine: hub neighbor loses to the true pair") {
    // hub h is moderately similar to EVERY side-A vector, so its own
    // k-NN-list average is high and its margin collapses; partner p is
    // close only to x. cos(x,h) > cos(x,p) by construction, yet the mined
    // pair for x must be p — the property raw-cosine thresholds lack.
    val x = (0L, Array(1f, 0.4f, 0f, 0f, 0f, 0f))
    val a = Seq(x,
      (2L, Array(0f, 0.4f, 1f, 0f, 0f, 0f)),
      (4L, Array(0f, 0.4f, 0f, 1f, 0f, 0f)),
      (6L, Array(0f, 0.4f, 0f, 0f, 1f, 0f)))
    val h = (1L, Array(0.8f, 1.2f, 0.8f, 0.8f, 0.8f, 0f))
    val p = (3L, Array(0.55f, 0.1f, 0f, 0f, 0f, 0.9f))
    val b = Seq(h, p,
      (5L, Array(0f, 0f, 0f, 0f, 0.2f, 1f)),
      (7L, Array(0f, 0f, 0.1f, 0f, 0f, 1f)))
    assert(cos(x._2, h._2) > cos(x._2, p._2), "precondition: hub beats partner on raw cosine")
    val got = MarginMine.mineMutual(
        a.toDF("vec_id", "embedding"), b.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3, threshold = 0.0)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(got(0L) == 3L, s"x must pair with partner p, got ${got(0L)}")
  }

  test("non-mutual forward candidates are dropped") {
    // y is x's forward top-1 but y's backward top-1 is a2 — with k=1 the
    // (x, y) pair fails mutuality and x emits nothing; (a2, y) is mutual.
    val a = Seq(
      (0L, Array(1f, 0f, 0f)),
      (2L, Array(0.9f, 0.5f, 0f)))
    val b = Seq((1L, Array(0.9f, 0.5f, 0.05f)))
    val got = MarginMine.mineMutual(
        a.toDF("vec_id", "embedding"), b.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 1, threshold = 0.0)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((2L, 1L)))
  }

  test("threshold prunes sub-margin pairs entirely") {
    val a = Seq((0L, Array(1f, 0.1f, 0f)), (2L, Array(0f, 0.1f, 1f)))
    val b = Seq((1L, Array(0.9f, 0.2f, 0.1f)), (3L, Array(0.1f, 0.2f, 0.9f)))
    def mine(thr: Double) = MarginMine.mineMutual(
      a.toDF("vec_id", "embedding"), b.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 2, threshold = thr)
    assert(mine(0.0).count() == 2)
    assert(mine(99.0).count() == 0)
  }

  test("full-chain agreement with a driver-side brute-force replay") {
    def mkVec(seed: Int): Array[Float] =
      Array.tabulate(8)(d => math.sin(seed * 11 + d * 3 + 1).toFloat)
    val k = 3
    val a = (0 until 12 by 2).map(i => (i.toLong, mkVec(i)))
    val b = (1 until 41 by 2).map(i => (i.toLong, mkVec(i)))
    val got = MarginMine.mineMutual(
        a.toDF("vec_id", "embedding"), b.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k, threshold = 0.0)
      .select("query_id", "neighbor_id", "margin")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap

    // replay: 6-dp sims, top-k by (sim desc, id asc), exact-decimal sums,
    // one IEEE division per margin, best per query by (margin desc, id asc)
    def topk(q: Array[Float], side: Seq[(Long, Array[Float])]) =
      side.map { case (id, v) => (id, r6(cos(q, v))) }
        .sortBy { case (id, s) => (-s, id) }.take(k)
    val fwd = a.map { case (x, xv) => x -> topk(xv, b) }.toMap
    val sumA = fwd.map { case (x, l) => x -> l.map(_._2).sum }
    val cand = fwd.values.flatten.map(_._1).toSet
    val bwd = b.filter(c => cand(c._1))
      .map { case (y, yv) => y -> topk(yv, a) }.toMap
    val sumB = bwd.map { case (y, l) => y -> l.map(_._2).sum }
    val expected = fwd.flatMap { case (x, l) =>
      val ms = l.filter { case (y, _) => bwd(y).exists(_._1 == x) }
        .map { case (y, s) =>
          val m = r6(((s * (2 * k)).toDouble / (sumA(x) + sumB(y)).toDouble))
          (y, m.toDouble)
        }
      if (ms.isEmpty) None
      else Some(x -> ms.minBy { case (y, m) => (-m, y) })
    }
    assert(got == expected)
  }

  test("forward head broadcasts the bounded query side") {
    val a = (0 until 4).map(i => (i.toLong, Array.fill(4)(i.toFloat + 1)))
    val b = (10 until 30).map(i => (i.toLong, Array.fill(4)(i.toFloat)))
    val plan = MarginMine.mineMutual(
        a.toDF("vec_id", "embedding"), b.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 2, 0.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }
}
