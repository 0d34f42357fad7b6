package graft.text

import graft.SparkTestBase

class SurvivalWilsonSpec extends SparkTestBase {
  import spark.implicits._

  private def pin(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference Wilson interval, the same fixed-order arithmetic. */
  private def wilson(k: Long, n: Long, z: Double): (Double, Double) = {
    val zz = z * z
    val nn = n.toDouble
    val p = k.toDouble / nn
    val denom = 1.0 + zz / nn
    val center = (p + zz / (2.0 * nn)) / denom
    val half = (z * math.sqrt(p * (1.0 - p) / nn + zz / (4.0 * nn * nn))) / denom
    (pin(math.max(0.0, center - half)), pin(math.min(1.0, center + half)))
  }

  // keepExpr with default bounds (20 tokens minimum): the 20-token diverse
  // doc passes every rule; a one-word doc fails the length rule
  private def good(i: Int) =
    s"the quick brown fox jumps over a lazy dog number$i variant word$i " +
      "extra tokens here now plus more filler words"
  private def docs = (
    (1 to 30).map(i => (good(i), "big")) ++
    Seq(("tiny", "big")) ++
    (1 to 3).map(i => (good(i), "small")) ++
    Seq(("tiny", "small"))
  ).toDF("text", "source")

  test("intervals bracket the keep rate and match the reference formula") {
    val out = Heuristics.survivalWilson(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    for ((src, (n, k, rate, lo, hi)) <- out) {
      val (wlo, whi) = wilson(k, n, 1.96)
      assert(lo == wlo && hi == whi, s"$src: ($lo,$hi) vs ($wlo,$whi)")
      assert(lo <= rate && rate <= hi, s"$src: rate outside its own CI")
    }
  }

  test("smaller groups get wider intervals at a comparable rate") {
    val out = Heuristics.survivalWilson(docs, "text", "source")
      .collect().map(r => r.getString(0) -> (r.getDouble(5) - r.getDouble(4))).toMap
    assert(out("small") > out("big"),
      s"small-n interval must be wider: $out")
  }

  test("degenerate rates stay inside [0, 1]") {
    val allFail = Seq(("x", "s"), ("y", "s")).toDF("text", "source")
    val row = Heuristics.survivalWilson(allFail, "text", "source").collect().head
    assert(row.getLong(2) == 0L)
    assert(row.getDouble(4) >= 0.0 && row.getDouble(5) <= 1.0)
    assert(row.getDouble(4) == 0.0, "k=0 Wilson lower bound is exactly 0 after clamping")
  }
}
