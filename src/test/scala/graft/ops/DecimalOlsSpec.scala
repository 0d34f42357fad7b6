package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Exact-decimal OLS: hand-computed coefficients, bitwise summation-order
  * invariance, and the bounded-axis contract.
  */
class DecimalOlsSpec extends SparkTestBase {
  import spark.implicits._

  test("exact line recovered exactly") {
    val df = (1 to 10).map(i => (i.toDouble, 2.0 * i + 3.0)).toDF("x", "y")
    val r = DecimalOls.fit(df, col("x"), col("y")).head()
    assert(r.getLong(0) == 10L && r.getDouble(1) == 2.0 && r.getDouble(2) == 3.0)
  }

  test("hand-computed non-collinear fit") {
    // (0,0),(1,1),(2,4): slope = 2, intercept = -1/3
    val df = Seq((0.0, 0.0), (1.0, 1.0), (2.0, 4.0)).toDF("x", "y")
    val r = DecimalOls.fit(df, col("x"), col("y")).head()
    assert(r.getDouble(1) == 2.0)
    assert(r.getDouble(2) == -0.333333)
  }

  test("result is bitwise invariant to partitioning / summation order") {
    val rnd = new scala.util.Random(3)
    val pts = (1 to 500).map(_ => (rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val a = DecimalOls.fit(pts.toDF("x", "y"), col("x"), col("y")).head()
    val b = DecimalOls.fit(pts.reverse.toDF("x", "y").repartition(17),
      col("x"), col("y")).head()
    assert(a.getDouble(1) == b.getDouble(1) && a.getDouble(2) == b.getDouble(2))
  }

  test("the 999-point bounded-axis contract fails loudly past the bound") {
    val df = (1 to 1000).map(i => (i.toDouble / 10, i.toDouble / 10)).toDF("x", "y")
    intercept[Exception] { DecimalOls.fit(df, col("x"), col("y")).collect() }
  }

  test("|x| >= 1000 fails loudly instead of silently rounding") {
    val df = Seq((1000.5, 1.0), (1.0, 2.0)).toDF("x", "y")
    intercept[Exception] { DecimalOls.fit(df, col("x"), col("y")).collect() }
  }
}
