package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewReportSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  test("topHotKeys ranks by count desc with deterministic key tie-break") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(30)("c") ++
      Seq.fill(5)("d")).toDF("k")
    val got = Skew.topHotKeys(df, "k", 3)
      .select("rank", "k", "n", "share").as[(Int, String, Long, Double)].collect().toSeq
    assert(got == Seq((1, "a", 50L, 50.0 / 115), (2, "b", 30L, 30.0 / 115),
      (3, "c", 30L, 30.0 / 115)).map { case (r, k, n, s) =>
      (r, k, n, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) })
  }

  test("plan is TakeOrdered over the aggregate — no global sort of all keys") {
    val df = (0 until 1000).map(i => s"k${i % 97}").toDF("k")
    val plan = Skew.topHotKeys(df, "k", 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
