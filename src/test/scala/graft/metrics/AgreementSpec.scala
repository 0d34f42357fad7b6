package graft.metrics

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AgreementSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference Fleiss κ / Krippendorff α computed the textbook way on the
    * driver for a small vote vector (v_i = votes for category 1 of m).
    */
  private def reference(vs: Seq[Int], m: Int): (Double, Double) = {
    val n = vs.size.toDouble
    val pi = vs.map(v => (v * v + (m - v) * (m - v) - m).toDouble / (m * (m - 1)))
    val pBar = pi.sum / n
    val p1 = vs.sum / (n * m)
    val pe = p1 * p1 + (1 - p1) * (1 - p1)
    val kappa = (pBar - pe) / (1 - pe)
    val doo = vs.map(v => v * (m - v) * 2.0 / (m - 1)).sum / (n * m)
    val n1 = vs.sum.toDouble; val n0 = n * m - n1
    val de = 2 * n0 * n1 / ((n * m) * (n * m - 1))
    (kappa, 1 - doo / de)
  }

  test("Fleiss kappa and Krippendorff alpha match the textbook formulas") {
    val vs = Seq(0, 0, 1, 1, 2, 2, 3, 3, 3, 0, 1, 2)
    val df = vs.toDF("v")
    val r = Agreement.binaryAgreement(df, col("v"), nRaters = 3).collect().head
    val (k, a) = reference(vs, 3)
    assert(math.abs(r.getAs[Double]("kappa") - k) < 1e-6)
    assert(math.abs(r.getAs[Double]("alpha") - a) < 1e-6)
    assert(r.getAs[Long]("n_items") == 12L)
  }

  test("perfect agreement gives kappa 1, alpha 1") {
    val df = Seq(0, 3, 0, 3, 3, 0).toDF("v")
    val r = Agreement.binaryAgreement(df, col("v"), nRaters = 3).collect().head
    assert(r.getAs[Double]("kappa") == 1.0)
    assert(r.getAs[Double]("alpha") == 1.0)
  }

  test("all-items-split agreement is worse than chance (negative kappa)") {
    // every item gets a 2-1 split in alternating directions: observed
    // agreement is the minimum possible for m=3 → κ < 0
    val df = Seq(1, 2, 1, 2, 1, 2, 1, 2).toDF("v")
    val r = Agreement.binaryAgreement(df, col("v"), nRaters = 3).collect().head
    assert(r.getAs[Double]("kappa") < 0.0)
    assert(r.getAs[Double]("p_bar") < r.getAs[Double]("p_e"))
  }

  test("the plan is one single-pass aggregate (no join, no window)") {
    val df = Seq(0, 1, 2, 3).toDF("v")
    val plan = Agreement.binaryAgreement(df, col("v"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"agreement should be a pure aggregate:\n$plan")
  }
}
