package graft.metrics

import graft.SparkTestBase

class CalibrationSpec extends SparkTestBase {
  import spark.implicits._

  private def pin(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // one group, hand-placed probabilities: bin 0 holds (0.05, y=0) twice;
  // bin 9 holds (0.95, y=1), (0.92, y=0); p = 1.0 must land in bin 9
  private def preds = Seq(
    ("g", 0.0, 0.05), ("g", 0.0, 0.05),
    ("g", 1.0, 0.95), ("g", 0.0, 0.92),
    ("g", 1.0, 1.0)
  ).toDF("grp", "label", "probability")

  test("bins, confidence, and accuracy match the hand oracle; p = 1 stays in the last bin") {
    val out = Calibration.calibrationBins(preds, "label", "probability", Seq("grp"), 10)
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out.keySet == Set(0, 9))
    assert(out(0) == ((2L, 0.05, 0.0)))
    assert(out(9)._1 == 3L)
    assert(out(9)._2 == pin((0.95 + 0.92 + 1.0) / 3))
    assert(out(9)._3 == pin(2.0 / 3))
  }

  test("ece is the bin-weighted |acc - conf| mean") {
    val row = Calibration.ece(preds, "label", "probability", Seq("grp"), 10)
      .collect().head
    val conf9 = pin((0.95 + 0.92 + 1.0) / 3)
    val acc9 = pin(2.0 / 3)
    val want = pin(pin(2 * math.abs(0.0 - 0.05) + 3 * math.abs(acc9 - conf9)) / 5)
    assert(row.getLong(1) == 5L)
    assert(row.getDouble(2) == want)
  }

  test("a perfectly calibrated constant predictor scores ece = 0") {
    val d = Seq(("g", 1.0, 0.75), ("g", 1.0, 0.75), ("g", 0.0, 0.75), ("g", 1.0, 0.75))
      .toDF("grp", "label", "probability")
    val row = Calibration.ece(d, "label", "probability", Seq("grp"), 10).collect().head
    assert(row.getDouble(2) == 0.0)
  }

  test("groups stay independent") {
    val d = Seq(("a", 1.0, 0.95), ("b", 0.0, 0.95)).toDF("grp", "label", "probability")
    val out = Calibration.ece(d, "label", "probability", Seq("grp"), 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("a") == 0.05 && out("b") == 0.95)
  }
}
