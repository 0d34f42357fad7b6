package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact corpus heavy hitters with a mergeable Misra-Gries candidate sketch
  * — the two-pass shape that stays exact at 100 TB:
  *
  *   1. CANDIDATES: a single [[Aggregator]] pass maintains ≤ k counters per
  *      partition and merges them associatively (Agarwal et al. 2012,
  *      "Mergeable summaries": combine counts, then subtract the (k+1)-th
  *      largest and drop non-positives). The merged sketch provably
  *      contains EVERY token with true frequency > n/(k+1) — one tiny
  *      array row reaches the driver, never a token histogram.
  *   2. RECOUNT: exact counts for the ≤ k candidates only — the explode
  *      stream semi-joins a BROADCAST candidate list before the groupBy,
  *      so the shuffled key space is bounded by k regardless of corpus
  *      vocabulary (map-side partial aggregation does the rest).
  *
  * With threshold minShare ≥ 1/(k+1) the output is EXACTLY the set
  * { token : freq ≥ minShare · n } — no approximation survives to the
  * result, which is what makes the gate oracle-able against a brute-force
  * SQL count. A plain `groupBy(token)` would shuffle the full vocabulary
  * (billions of keys at corpus scale) to answer a ≤ k-row question.
  */
object HeavyHitters {

  /** Mergeable Misra-Gries sketch over a token stream. Buffer is the
    * counter map (≤ 2k entries transiently during merge).
    */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(k > 0, s"sketch size k=$k must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
      buf.get(x) match {
        case Some(c) => buf.updated(x, c + 1)
        case None if buf.size < k => buf.updated(x, 1L)
        case None =>
          // decrement-all: drop zeros, no insert
          buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-th largest count from all, keep positives:
        // the standard mergeable-summaries reduction back to k counters
        val cut = combined.values.toArray.sorted(Ordering.Long.reverse).apply(k)
        combined.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
      }
    }

    override def finish(buf: Map[String, Long]): Seq[String] = buf.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** Column form: one row holding the ≤ k candidate tokens. */
  def mgCandidates(k: Int)(tok: Column): Column = udaf(new MisraGries(k)).apply(tok)

  /** Exact heavy hitters: every token with frequency > n/denom (integer
    * division-free: the comparison is `freq · denom > n`, exact in Long
    * arithmetic in any engine — no float threshold to straddle a boundary).
    * Exactness requires denom ≤ sketchK+1 — the MG superset guarantee —
    * enforced here.
    */
  def exactHeavyHitters(df: DataFrame, tokensCol: Column,
      sketchK: Int, denom: Int): DataFrame = {
    require(denom >= 1 && denom <= sketchK + 1,
      s"denom=$denom above sketchK+1=${sketchK + 1}: " +
        "the MG candidate set could miss a token with freq > n/denom")
    val toks = df.select(explode(tokensCol).as("token"))
    val cands = toks.select(explode(mgCandidates(sketchK)(col("token"))).as("token"))
    val total = toks.select(count(lit(1)).as("__n"))
    toks.join(broadcast(cands), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * lit(denom.toLong) > col("__n"))
      .select(col("token"), col("freq"))
  }
}
