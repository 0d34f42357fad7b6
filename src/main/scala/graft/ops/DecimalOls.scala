package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form simple linear regression with EXACT decimal moment sums —
  * the PageRank/BM25 reduction-order-proof discipline applied to OLS:
  * inputs pin to 6 dp, every sum and product is shaped to stay inside
  * DECIMAL(38) with zero intermediate rounding, and each coefficient is
  * ONE IEEE division of two exact decimals — so the result is the same
  * rational in any engine, independent of summation order.
  *
  * Domain contract (each bound ENFORCED loudly by an ANSI decimal cast,
  * never silently rounded): |x|, |y| < 1000 and n ≤ 999. That budget is
  * what lets sy·sxx (the widest product, scale 18) stay exact at
  * precision 36. This is the fit for BOUNDED-axis diagnostics (Zipf head
  * slopes on log scales, scaling-law curves over a handful of runs) — for
  * corpus-sized regression use spark.ml's solvers; exactness, not
  * throughput, is the point here.
  */
object DecimalOls {

  /** One-row frame (n_points, slope, intercept) for y ≈ intercept +
    * slope·x over (xExpr, yExpr) of `df`.
    */
  def fit(df: DataFrame, xExpr: Column, yExpr: Column): DataFrame = {
    val pts = df.select(
      round(xExpr.cast("double"), 6).cast("decimal(9,6)").as("x"),
      round(yExpr.cast("double"), 6).cast("decimal(9,6)").as("y"))
    val agg = pts.agg(
      count(lit(1)).cast("decimal(3,0)").as("n"),
      sum(col("x")).cast("decimal(13,6)").as("sx"),
      sum(col("y")).cast("decimal(13,6)").as("sy"),
      sum(col("x") * col("y")).cast("decimal(22,12)").as("sxy"),
      sum(col("x") * col("x")).cast("decimal(22,12)").as("sxx"))
    val den = agg("n") * col("sxx") - col("sx") * col("sx")
    agg.select(
      col("n").cast("long").as("n_points"),
      round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        den.cast("double"), 6).as("slope"),
      round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
        den.cast("double"), 6).as("intercept"))
  }
}
