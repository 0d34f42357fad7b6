package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/** C4 / Gopher-style heuristic document filters (beyond-reference
  * training-data op; rule family after Raffel et al. 2020 §2.2 and Rae et
  * al. 2021 A.1.1 — both public papers).
  *
  * Each rule is a pure codegen'd boolean over the text column; the `keep`
  * decision is their conjunction. Nothing here shuffles: the filter is a
  * row-local projection that fuses into the enclosing scan's
  * WholeStageCodegen span, so at 100 TB it costs one pass that rides on a
  * scan the pipeline was doing anyway. The survival report is one
  * map-side-combined groupBy on a low-cardinality key.
  */
object Heuristics {

  /** Rule thresholds. Defaults are discriminative on the synthetic corpus;
    * real deployments tune per-corpus (the C4 paper's own bounds — ≥3
    * sentences, ≥5 words/line, "lorem ipsum"/brace blocklists — assume
    * prose with punctuation, which the synthetic tables lack, so terminal
    * punctuation is opt-in here).
    */
  final case class Bounds(
      minTokens: Int = 20,
      maxTokens: Int = 95,
      minTtr: Double = 0.35,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 6.0,
      maxStopRatio: Double = 0.12,
      requireTerminalPunct: Boolean = false,
      blocklist: Seq[String] = Seq("lorem ipsum", "javascript", "{"))

  /** True when the trimmed text ends in sentence-terminal punctuation. */
  def terminalPunct(text: Column): Column =
    substring(rtrim(text), -1, 1).isin(".", "!", "?", "\"")

  /** True when the lowercased text contains any blocklisted phrase. */
  def containsBlocked(text: Column, blocklist: Seq[String]): Column =
    blocklist
      .map(p => lower(text).contains(lit(p)))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

  /** Named boolean rules over a text column, in output order. */
  def rules(
      text: Column,
      stopwords: Seq[String],
      b: Bounds): Seq[(String, Column)] =
    Seq(
      "f_len" -> tokenCount(text).between(b.minTokens, b.maxTokens),
      "f_ttr" -> (typeTokenRatio(text) >= b.minTtr),
      "f_meanlen" -> avgTokenLen(text).between(b.minMeanLen, b.maxMeanLen),
      "f_stop" -> (stopwordRatio(text, stopwords) <= b.maxStopRatio),
      "f_blocklist" -> !containsBlocked(text, b.blocklist),
    ) ++ (if (b.requireTerminalPunct) Seq("f_terminal" -> terminalPunct(text))
          else Nil)

  /** The filter decision alone — conjunction of every rule. */
  def keepExpr(
      text: Column,
      stopwords: Seq[String] = Seq("the", "a"),
      b: Bounds = Bounds()): Column =
    rules(text, stopwords, b).map(_._2).reduce(_ && _)

  /** Per-document rule flags (1 = pass) and the conjunction `keep`.
    * Output: idCol, f_len, f_ttr, f_meanlen, f_stop, f_blocklist
    * [, f_terminal], keep — all integer-typed so the gate hash is exact.
    */
  def flags(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String] = Seq("the", "a"),
      b: Bounds = Bounds()): DataFrame = {
    val rs = rules(col(textCol), stopwords, b)
    val flagCols = rs.map { case (n, c) => c.cast("int").as(n) }
    val keep = rs.map(_._2).reduce(_ && _).cast("int").as("keep")
    df.select((col(idCol) +: flagCols :+ keep): _*)
  }

  /** Corpus-curation report: per-group document survival under the filter.
    * One narrow aggregate over the rule projection — partial-aggregated
    * map-side, so the shuffle carries |groups| rows, not |docs|.
    */
  def survival(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      stopwords: Seq[String] = Seq("the", "a"),
      b: Bounds = Bounds()): DataFrame = {
    val keep = keepExpr(col(textCol), stopwords, b).cast("int")
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(keep).as("n_kept"),
        round(sum(keep) / count(lit(1)), 6).as("keep_rate"))
  }

  /** [[survival]] with a Wilson score interval on each group's keep rate —
    * the CI a curation dashboard needs before judging a small source's
    * survival differs from the fleet's (a 60%-keep source with 20 docs is
    * NOT evidence against a 70% target; with 20k docs it is). Wilson beats
    * the normal approximation at extreme rates and small n, and never
    * leaves [0, 1].
    *
    *   center = (p̂ + z²/2n) / (1 + z²/n),
    *   half   = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)
    *
    * z² is a driver-computed literal so both engines share one double; the
    * rest is fixed-order IEEE arithmetic from the exact integer counts,
    * replayed token-for-token by the oracle. Same |groups|-axis aggregate
    * as [[survival]] — scale-free.
    */
  def survivalWilson(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      stopwords: Seq[String] = Seq("the", "a"),
      b: Bounds = Bounds(),
      z: Double = 1.96): DataFrame = {
    val zz = z * z
    val n = col("n_docs").cast("double")
    val p = col("n_kept").cast("double") / n
    val denom = lit(1.0) + lit(zz) / n
    val center = (p + lit(zz) / (lit(2.0) * n)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / n +
      lit(zz) / (lit(4.0) * n * n))) / denom
    survival(df, textCol, groupCol, stopwords, b)
      .select(col(groupCol), col("n_docs"), col("n_kept"), col("keep_rate"),
        round(greatest(lit(0.0), center - half), 6).as("ci_lo"),
        round(least(lit(1.0), center + half), 6).as("ci_hi"))
  }
}
