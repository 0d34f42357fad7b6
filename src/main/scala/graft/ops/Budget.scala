package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.hash60

/** Token-budget corpus selection (beyond-reference training-data op): keep
  * the highest-scoring documents until a token budget is met — WITHOUT a
  * global sort.
  *
  * A global `orderBy(score).limit-by-running-sum` would funnel the corpus
  * through one sorting task. Instead scores quantize to `nBins` buckets and
  * selection happens per bin: every bin wholly above the budget boundary
  * keeps everything (rate 1), bins below keep nothing (rate 0), and the one
  * boundary bin keeps the deterministic hash fraction that lands the kept
  * token mass on the budget in expectation. The histogram is one
  * map-side-combined aggregate shuffling ≤ nBins rows with ≤ nBins scalars
  * reaching the driver (the bounded-axis pattern); the filter is a
  * literal-CASE codegen scan — no join, no sort, no window over data rows.
  *
  * Rate branches compare INTEGER token sums (`above ≥ B`, `above+tok ≤ B`)
  * so engine-identical decisions need no float tolerance; the boundary
  * bin's fractional rate is one fixed-shape double division a SQL oracle
  * replays exactly.
  */
object Budget {

  /** Per-bin acceptance rates, descending-score greedy fill. */
  private[ops] def binRates(
      hist: Seq[(Int, Long)],
      budget: Long): Map[Int, Double] = {
    var above = 0L
    hist.sortBy(-_._1).map { case (bin, tok) =>
      val rate =
        if (above >= budget) 0.0
        else if (above + tok <= budget) 1.0
        else (budget - above).toDouble / tok
      above += tok
      bin -> rate
    }.toMap
  }

  /** Filter `df` to the highest-score documents totalling ~`budget` tokens.
    * Scores ≥ 1 share the top bin and scores < 0 the bottom bin (clamped,
    * mirroring the oracle's greatest/least); a NULL score is corrupt input
    * and fails the job loudly instead of NPE-ing at the histogram collect.
    */
  def selectByBudget(
      df: DataFrame,
      idCol: String,
      tokenExpr: Column,
      scoreExpr: Column,
      budget: Long,
      nBins: Int = 100): DataFrame = {
    require(budget >= 0 && nBins > 0, "budget and nBins must be non-negative")
    val bin = when(scoreExpr.isNull,
        raise_error(concat(lit("selectByBudget: null score for id "),
          col(idCol).cast("string"))))
      .otherwise(greatest(least(floor(scoreExpr * nBins), lit(nBins - 1)), lit(0)))
      .cast("int")
    val hist = df
      .groupBy(bin.as("__bin"))
      .agg(sum(tokenExpr).as("__tok"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .toSeq
    val rates = binRates(hist, budget)
    val rateExpr = rates.foldLeft(lit(0.0)) { case (acc, (b, r)) =>
      when(bin === b, lit(r)).otherwise(acc)
    }
    df.filter(
      pmod(hash60(col(idCol).cast("string")), lit(1000000L))
        < rateExpr * lit(1000000.0))
  }
}
