package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.hash60

/** Domain-mixture resampling (beyond-reference training-data op): reshape a
  * corpus toward target mixture weights per group (the fixed-weight step of
  * Pile/DoReMi-style data curation — public papers) WITHOUT upsampling.
  *
  * Given target weight w_g per group and observed token mass tok_g, the
  * largest total T servable at the target mixture without replicating any
  * document is T = min_g(tok_g / w_g); each group then keeps
  * rate_g = min(1, w_g · T / tok_g) of its documents (the limiting group
  * keeps everything). Acceptance is the pure content hash used by the
  * other samplers — no RNG state, membership stable as the corpus grows.
  *
  * Scale: pass 1 is one map-side-combined aggregate whose shuffle carries
  * |groups| rows; only |groups| scalars reach the driver (the same
  * bounded-axis pattern as the period axis). Pass 2 is a filtered scan with
  * the rates inlined as a literal CASE — no join, fuses into codegen.
  */
object Mixture {

  /** Acceptance rate per group. Deterministic pure-double arithmetic
    * (division / min / multiply in a fixed shape) so a SQL oracle
    * reproduces the rates bit-for-bit from the same counts.
    */
  def mixtureRates(
      df: DataFrame,
      groupCol: String,
      tokenExpr: Column,
      weights: Map[String, Double]): Map[String, Double] = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val toks = df
      .filter(col(groupCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(groupCol))
      .agg(sum(tokenExpr).as("tok"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble)
      .toMap
    val missing = weights.keySet -- toks.keySet
    require(missing.isEmpty, s"groups with a target weight but no rows: $missing")
    val t = toks.map { case (g, tok) => tok / weights(g) }.min
    toks.map { case (g, tok) => g -> math.min(1.0, weights(g) * t / tok) }
  }

  /** Filter `df` down to the mixture sample. Rows whose group has no target
    * weight are dropped.
    */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      tokenExpr: Column,
      weights: Map[String, Double]): DataFrame = {
    val rates = mixtureRates(df, groupCol, tokenExpr, weights)
    val rateExpr = rates.foldLeft(lit(-1.0)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.filter(
      pmod(hash60(col(idCol).cast("string")), lit(1000000L))
        < rateExpr * lit(1000000.0))
  }

  /** Temperature-scaled mixture weights (XLM-R / mC4-style multilingual
    * rebalancing — public papers): target weight_g ∝ share_g^(1/T) with
    * 1/T = 0.5, i.e. sqrt — flattening the head languages and boosting the
    * tail without any hand-set weight map. sqrt (not pow) on purpose:
    * IEEE-754 requires sqrt correctly rounded, so Spark and any SQL oracle
    * compute bit-identical weights from the same masses, where a libm
    * pow(x, α) may differ by an ulp between engines.
    *
    * One map-side-combined aggregate (|groups| rows shuffle), denominators
    * via broadcast of the 1-row total — no collect, no window.
    */
  def temperatureWeights(
      df: DataFrame,
      groupCol: String,
      tokenExpr: Column): DataFrame = {
    val masses = df.groupBy(col(groupCol)).agg(sum(tokenExpr).as("n_tokens"))
    val totals = masses.agg(
      sum(col("n_tokens")).as("__tot"),
      sum(sqrt(col("n_tokens"))).as("__sq_tot"))
    masses.crossJoin(broadcast(totals))
      .select(col(groupCol),
        col("n_tokens"),
        round(col("n_tokens") / col("__tot"), 6).as("share"),
        round(sqrt(col("n_tokens")) / col("__sq_tot"), 6).as("weight"))
  }

  /** Gate-friendly report: per-group kept docs/tokens and the rate. */
  def mixtureReport(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      tokenExpr: Column,
      weights: Map[String, Double]): DataFrame = {
    val rates = mixtureRates(df, groupCol, tokenExpr, weights)
    val rateExpr = rates.foldLeft(lit(-1.0)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    mixtureSample(df, idCol, groupCol, tokenExpr, weights)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenExpr).as("n_tokens"),
        round(max(rateExpr), 6).as("rate"))
  }
}
