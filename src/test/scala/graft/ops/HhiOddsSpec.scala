package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class HhiOddsSpec extends SparkTestBase {
  import spark.implicits._

  test("HHI: monopoly = 10000, equal split = 10000/n") {
    val df = Seq(("m1", "a", 100L), ("m2", "a", 50L), ("m2", "b", 50L),
      ("m3", "a", 25L), ("m3", "b", 25L), ("m3", "c", 25L), ("m3", "d", 25L))
      .toDF("mkt", "member", "v")
    val r = Experiments.hhi(df, col("mkt"), col("member"), col("v"))
      .collect().map(x => x.getString(0) -> ((x.getDouble(2), x.getBoolean(3)))).toMap
    assert(r("m1") == ((10000.0, true)))
    assert(r("m2") == ((5000.0, true)))
    assert(r("m3") == ((2500.0, false))) // boundary: > 2500 strictly
  }

  test("odds ratio matches the textbook 2x2 computation in ln space") {
    // arm 0: 30/100; arm 1: 10/100 → OR = (30*90)/(70*10)
    val rows = (1 to 100).map(i => (0L, i <= 30)) ++ (1 to 100).map(i => (1L, i <= 10))
    val r = Experiments.oddsRatio(rows.toDF("arm", "converted"),
      col("arm"), col("converted")).collect().head
    val lnOr = math.log(30.0 * 90 / (70.0 * 10))
    val se = math.sqrt(1.0 / 30 + 1.0 / 70 + 1.0 / 10 + 1.0 / 90)
    assert(math.abs(r.getAs[Double]("ln_odds_ratio") - lnOr) < 1e-6)
    assert(math.abs(r.getAs[Double]("ln_or_ci_lo") - (lnOr - 1.959964 * se)) < 1e-6)
    assert(r.getAs[Boolean]("significant")) // CI excludes 0
    val lnRr = math.log(0.3 / 0.1)
    assert(math.abs(r.getAs[Double]("ln_relative_risk") - lnRr) < 1e-6)
  }
}
