package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class NegativeSamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def pin(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("unigram^0.75 table matches the hand computation") {
    // counts: the=16, cat=1 — α=0.75 lifts the tail: 1 vs 16^0.75 = 8
    val d = Seq((1L, ("the " * 16).trim + " cat")).toDF("id", "text")
    val out = NegativeSampling.table(d, col("text"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val tThe = pin(math.pow(16, 0.75), 6)
    val tCat = pin(math.pow(1, 0.75), 6)
    val z = BigDecimal(tThe) + BigDecimal(tCat)
    assert(out("the") == ((16L, pin(tThe / z.toDouble, 9))))
    assert(out("cat") == ((1L, pin(tCat / z.toDouble, 9))))
    // the whole point: tail word's share (1/9) beats its raw share (1/17)
    assert(out("cat")._2 > 1.0 / 17)
  }

  test("probabilities sum to ~1 and respect count order") {
    val d = Seq((1L, "a a a a b b c")).toDF("id", "text")
    val out = NegativeSampling.table(d, col("text"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(out.values.sum - 1.0) < 1e-6)
    assert(out("a") > out("b") && out("b") > out("c"))
  }

  test("alpha = 1 reproduces the raw unigram distribution") {
    val d = Seq((1L, "x x x y")).toDF("id", "text")
    val out = NegativeSampling.table(d, col("text"), alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("x") == 0.75 && out("y") == 0.25)
  }

  test("rejects alpha outside (0, 1]") {
    val d = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      NegativeSampling.table(d, col("text"), alpha = 0.0)
    }
  }
}
