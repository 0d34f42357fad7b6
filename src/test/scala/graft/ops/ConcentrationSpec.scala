package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ConcentrationSpec extends SparkTestBase {
  import spark.implicits._

  test("kaplanMeier matches the textbook curve with censoring") {
    // classic: events at t=1 (d=1, n=5), t=3 (d=1, n=3); censored at 2 and 4;
    // one survivor censored at 5
    val rows = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L), (5L, 0L))
    val r = Experiments.kaplanMeier(rows.toDF("dur", "e"), col("dur"), col("e"))
      .collect().map(x => x.getLong(0) -> x.getDouble(5)).toMap
    assert(math.abs(r(1L) - 0.8) < 1e-6) // 1 - 1/5
    assert(math.abs(r(3L) - 0.8 * (1 - 1.0 / 3)) < 1e-6)
    assert(math.abs(r(5L) - r(3L)) < 1e-9) // censoring never drops the curve
  }

  test("kaplanMeier hits exactly zero when the whole risk set events") {
    val rows = Seq((1L, 1L), (2L, 1L), (2L, 1L))
    val r = Experiments.kaplanMeier(rows.toDF("dur", "e"), col("dur"), col("e"))
      .collect().map(x => x.getLong(0) -> x.getDouble(5)).toMap
    assert(r(2L) == 0.0)
    assert(r(1L) > 0.0)
  }

  test("paretoAbc: cumulative shares and class boundaries") {
    // values 70, 20, 10 → shares 0.7, 0.9, 1.0 → A, B, C (<= boundaries)
    val df = Seq(("a", 70L), ("b", 20L), ("c", 10L)).toDF("k", "v")
    val r = Experiments.paretoAbc(df, col("k"), col("v"))
      .collect().map(x => x.getString(0) -> ((x.getInt(2), x.getDouble(3), x.getString(4))))
      .toMap
    assert(r("a") == ((1, 0.7, "A")))
    assert(r("b") == ((2, 0.9, "B")))
    assert(r("c") == ((3, 1.0, "C")))
  }

  test("gini: 0 for equal values, known value for a hand case") {
    val eq = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L)).toDF("k", "v")
    assert(Experiments.gini(eq, col("k"), col("v")).collect().head.getDouble(2) == 0.0)
    // values 1, 3: G = 2*(1*1+2*3)/(2*4) - 3/2 = 14/8 - 1.5 = 0.25
    val two = Seq(("a", 1L), ("b", 3L)).toDF("k", "v")
    assert(math.abs(Experiments.gini(two, col("k"), col("v"))
      .collect().head.getDouble(2) - 0.25) < 1e-9)
  }

  test("abPower reproduces the closed-form sample size") {
    // base rate 0.3 from 30/100, mde 0.1
    val rows = (1 to 100).map(i => i <= 30)
    val r = Experiments.abPower(rows.toDF("converted"), col("converted"), mde = 0.1)
      .collect().head
    val p1 = 0.3; val p2 = 0.4
    val term = 1.959964 * math.sqrt(2 * p1 * (1 - p1)) +
      0.841621 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
    assert(r.getLong(3) == math.ceil(term * term / (0.1 * 0.1)).toLong)
    assert(r.getDouble(1) == 0.3)
  }
}
