package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probability-calibration diagnostics (Guo et al. 2017 "On Calibration of
  * Modern Neural Networks"; sklearn `calibration_curve`): reliability bins
  * and Expected Calibration Error. The screen every probabilistic scorer
  * in a curation pipeline (quality classifier, lang-id confidence, NB
  * posteriors) needs before its scores can gate documents by threshold —
  * an uncalibrated 0.9 is not a 90%.
  *
  * Binning is uniform on [0, 1] with the last bin closed (p = 1.0 lands in
  * bin B−1): bin = min(⌊p·B⌋, B−1) — exact integer arithmetic both
  * engines share. Per group and bin: n, mean confidence, empirical
  * accuracy, both 6-dp-pinned; ECE = Σ_b (n_b/n)·|acc_b − conf_b| is
  * computed FROM the pinned per-bin values so the B-term sum cannot drift.
  *
  * Scale shape: one map-side-combined aggregate to the (group, bin) axis —
  * ≤ |groups|·B rows regardless of corpus size; ECE is a second aggregate
  * on that bounded frame. Nothing sorts or windows data rows.
  */
object Calibration {

  private def binOf(p: Column, bins: Int): Column =
    least(floor(p * bins), lit(bins - 1)).cast("int")

  /** Reliability table: (groupCols..., bin, n_bin, conf, acc). */
  def calibrationBins(
      df: DataFrame,
      labelCol: String,
      probCol: String,
      groupCols: Seq[String],
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins >= 2: $bins")
    val gs = groupCols.map(col) :+ binOf(col(probCol), bins).as("bin")
    df.groupBy(gs: _*)
      .agg(count(lit(1)).as("n_bin"),
        round(avg(col(probCol)), 6).as("conf"),
        round(avg(col(labelCol).cast("double")), 6).as("acc"))
  }

  /** Expected Calibration Error per group: (groupCols..., n, ece). */
  def ece(
      df: DataFrame,
      labelCol: String,
      probCol: String,
      groupCols: Seq[String],
      bins: Int = 10): DataFrame = {
    val bt = calibrationBins(df, labelCol, probCol, groupCols, bins)
    val gs = groupCols.map(col)
    bt.groupBy(gs: _*)
      .agg(sum(col("n_bin")).as("n"),
        round(sum(col("n_bin") * abs(col("acc") - col("conf"))), 6).as("__w"))
      .select((gs :+ col("n") :+
        round(col("__w") / col("n"), 6).as("ece")): _*)
  }
}
