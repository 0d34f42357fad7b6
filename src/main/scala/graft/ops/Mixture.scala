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

  /** One DoReMi domain-reweighting step (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining" —
    * exponentiated-gradient update): from a uniform prior, each domain's
    * weight rises with its EXCESS loss over the corpus baseline,
    *
    *   α_g ∝ exp(η · max(0, L_g − L̄)),   weight_g = (1−c)·α_g/Z + c/|G|
    *
    * where L_g is the domain's mean per-doc loss (here proxied by the
    * corpus-LM nll from [[graft.text.LmScore]] — DoReMi's proxy-model
    * loss slot), L̄ the corpus mean, and c the uniform smoothing that
    * keeps every domain sampled. Harder-than-average domains get
    * upweighted — the step that produced DoReMi's published Pile weights.
    *
    * Cross-engine pinning: means are 6-dp-rounded BEFORE the subtraction
    * and exp (identical doubles in, identical doubles out), exp outputs
    * pin to 9 dp and normalize by an EXACT DECIMAL(28,9) sum, so the only
    * FP ops on unpinned values are single divisions/multiplies of
    * identical operands. Scale: two aggregates on the |domains| axis (one
    * corpus-sized map-side-combined pass each), two one-row cross joins —
    * nothing but the input scan touches the corpus axis.
    *
    * Input: one row per scored doc with (domainCol, nllCol); NULL nll
    * rows (unscoreable docs) are excluded from both means.
    * Output: (domain, n_docs, mean_nll, excess, weight).
    */
  def doremiStep(
      scored: DataFrame,
      domainCol: String,
      nllCol: String,
      eta: Double = 1.0,
      smoothing: Double = 0.01): DataFrame = {
    require(eta > 0, s"eta must be positive: $eta")
    require(smoothing >= 0 && smoothing < 1, s"smoothing in [0,1): $smoothing")
    val d = scored.select(col(domainCol).as("domain"), col(nllCol).as("nll"))
      .filter(col("nll").isNotNull)
    val perDom = d.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("nll")), 6).as("mean_nll"))
    val overall = d.agg(round(avg(col("nll")), 6).as("mean_all"))
    val raw = perDom.crossJoin(overall) // one scalar row
      .withColumn("excess",
        round(greatest(col("mean_nll") - col("mean_all"), lit(0.0)), 6))
      .withColumn("w_raw", round(exp(lit(eta) * col("excess")), 9))
    val z = raw.agg(
      sum(col("w_raw").cast("decimal(28,9)")).cast("double").as("z"),
      count(lit(1)).as("n_domains"))
    raw.crossJoin(z) // one scalar row
      .select(col("domain"), col("n_docs"), col("mean_nll"), col("excess"),
        round(lit(1.0 - smoothing) * (col("w_raw") / col("z")) +
          lit(smoothing) / col("n_domains"), 6).as("weight"))
  }
}
