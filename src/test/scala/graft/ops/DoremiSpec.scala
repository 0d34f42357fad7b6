package graft.ops

import graft.SparkTestBase

class DoremiSpec extends SparkTestBase {
  import spark.implicits._

  // two domains: "hard" mean nll 4.0, "easy" mean 2.0; corpus mean 3.0
  private def scored = Seq(
    ("hard", Some(5.0)), ("hard", Some(3.0)),
    ("easy", Some(2.5)), ("easy", Some(1.5)),
    ("easy", None) // unscoreable doc: excluded from both means
  ).toDF("source", "nll")

  test("hand-computed exponentiated-gradient step") {
    val out = Mixture.doremiStep(scored, "source", "nll")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("hard")._1 == 2L && out("easy")._1 == 2L)
    assert(out("hard")._2 == 4.0 && out("easy")._2 == 2.0)
    // excess: hard = 1.0, easy = max(0, -1) = 0
    assert(out("hard")._3 == 1.0 && out("easy")._3 == 0.0)
    // alpha = (e, 1)/Z with 9-dp pins; weight = 0.99*alpha + 0.01/2
    val e9 = math.rint(math.exp(1.0) * 1e9) / 1e9
    val z = e9 + 1.0
    def w(raw: Double) = math.rint((0.99 * (raw / z) + 0.005) * 1e6) / 1e6
    assert(math.abs(out("hard")._4 - w(e9)) < 1e-9)
    assert(math.abs(out("easy")._4 - w(1.0)) < 1e-9)
  }

  test("weights are a distribution and order by difficulty") {
    val out = Mixture.doremiStep(scored, "source", "nll")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.abs(out.values.sum - 1.0) < 1e-5, s"weights don't sum to 1: $out")
    assert(out("hard") > out("easy"))
  }

  test("uniform corpus keeps uniform weights") {
    val flat = Seq(("a", 3.0), ("b", 3.0), ("c", 3.0), ("a", 3.0))
      .toDF("source", "nll")
    val out = Mixture.doremiStep(flat, "source", "nll")
      .collect().map(_.getDouble(4))
    assert(out.forall(w => math.abs(w - 1.0 / 3) < 1e-6))
  }
}
