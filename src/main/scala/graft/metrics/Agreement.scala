package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-rater agreement for labeling QA — Fleiss' κ (Fleiss 1971,
  * "Measuring nominal scale agreement among many raters") and
  * Krippendorff's α (nominal data, equal raters per item). Beyond-
  * reference: a labeling pipeline shipping RLHF/SFT data needs to know
  * whether its raters (human or heuristic) agree beyond chance before the
  * labels are trusted; complement of the single-pair Cohen's κ already in
  * [[Metrics]].
  *
  * Both statistics reduce to three integer corpus sums when every item
  * gets the same `m` ratings over binary categories:
  *   N      = #items,
  *   S1     = Σ_i v_i            (total category-1 votes; v_i = votes for 1),
  *   SA     = Σ_i (v_i² + (m−v_i)²),
  *   SV01   = Σ_i v_i·(m−v_i)    (within-item disagreeing pairs ×1).
  * Everything downstream is scalar arithmetic on one row — the plan is a
  * single scan + single-pass decomposable aggregate (map-side combined,
  * whole-stage codegen), identical at any corpus size. Divisions happen
  * ONCE at the end in a fixed order the DuckDB oracle mirrors term-for-term.
  *
  *   Fleiss:        P̄ = (SA − N·m) / (N·m·(m−1)),
  *                  p1 = S1/(N·m),  Pe = p1² + (1−p1)²,
  *                  κ = (P̄ − Pe) / (1 − Pe).
  *   Krippendorff:  Do = SV01·2 / ((m−1)·N·m)      (coincidence form),
  *                  De = 2·n0·n1 / (Nm·(Nm−1)),  n1 = S1, n0 = N·m − S1,
  *                  α = 1 − Do/De.
  */
object Agreement {

  /** Binary multi-rater agreement from a per-item vote count `votesFor1`
    * (0..nRaters). Returns one row: n_items, n_raters, p_bar, p_e, kappa,
    * d_o, d_e, alpha — κ and α share the scan.
    */
  def binaryAgreement(items: DataFrame, votesFor1: Column, nRaters: Int): DataFrame = {
    require(nRaters >= 2, "agreement needs at least two raters")
    val m = lit(nRaters.toLong)
    val v = votesFor1.cast("long")
    val agg = items.agg(
      count(lit(1)).cast("long").as("n_items"),
      sum(v).as("s1"),
      sum(v * v + (m - v) * (m - v)).as("sa"),
      sum(v * (m - v)).as("sv01"))
    val nm = col("n_items") * m
    val pBar = (col("sa") - nm).cast("double") / (nm * lit(nRaters.toLong - 1L))
    val p1 = col("s1").cast("double") / nm
    val pe = p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
    val dO = (col("sv01") * lit(2L)).cast("double") / (lit(nRaters.toLong - 1L) * nm)
    val dE = (lit(2L) * (nm - col("s1")) * col("s1")).cast("double") / (nm * (nm - lit(1L)))
    agg.select(
      col("n_items"), lit(nRaters).as("n_raters"),
      round(pBar, 6).as("p_bar"),
      round(pe, 6).as("p_e"),
      round((pBar - pe) / (lit(1.0) - pe), 6).as("kappa"),
      round(dO, 6).as("d_o"),
      round(dE, 6).as("d_e"),
      round(lit(1.0) - dO / dE, 6).as("alpha"))
  }
}
