package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.hash60

/** Differentially-private release counts — the Laplace mechanism (Dwork et
  * al. 2006) over a grouped count query, for the numbers a corpus release
  * PUBLISHES (per-source/per-language document counts in a data card):
  * each cell gets Laplace(Δ/ε) noise with sensitivity Δ = 1, so the
  * published histogram is ε-DP per disjoint cell under add/remove-one-row
  * adjacency.
  *
  * Noise derivation is SEEDED and DETERMINISTIC: Laplace(b) is the
  * difference of two exponentials, b·(ln u₁ − ln u₂) with u₁, u₂ uniform
  * on (0, 1], and both uniforms come from the shared 60-bit md5 hash of
  * (seed, cell key) — the [[WeightedSample]] discipline. That makes
  * release builds reproducible across runs, engines, and cluster layouts,
  * and lets the SQL oracle replay every noisy cell bit-for-bit. The
  * honest caveat, stated rather than hidden: determinism trades away
  * secrecy of the noise — the ε guarantee holds against readers of the
  * PUBLISHED card, not against an adversary who knows the seed. Production
  * keeps the seed as private as the raw data (it is exactly as sensitive).
  *
  * Scale shape: ONE map-side-combined grouped count over the corpus; the
  * noise chain is a row-local codegen projection on the bounded |cells|
  * axis — nothing after the aggregate touches data rows. The transcendental
  * ln is pinned to 6 dp immediately (the LM-scoring discipline), so the
  * released values are exact decimal sums of a pinned term and an integer.
  *
  * Output: (group cols…, n, noisy_n, released_n) — n the true count (kept
  * for gate evidence; a real card would drop it), noisy_n the 6-dp noisy
  * value, released_n = max(0, round(noisy_n)) as the publishable integer.
  */
object DpRelease {

  /** Per-cell uniform in (0, 1] from the cell key — replayed verbatim by
    * the oracle: (hash60(seed#tag#key) + 1) / 2^60.
    */
  private def unif(tag: String, seed: String, key: Column): Column =
    (hash60(concat(lit(s"$seed#$tag#"), key)) + lit(1L)).cast("double") /
      lit(math.pow(2, 60))

  def laplaceCounts(
      df: DataFrame,
      groupCols: Seq[String],
      eps: Double,
      seed: String): DataFrame = {
    require(eps > 0, s"laplaceCounts: eps must be positive, got $eps")
    val counts = df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n"))
    val key = concat_ws("|", groupCols.map(col): _*)
    val noise = round(
      (log(unif("1", seed, key)) - log(unif("2", seed, key))) / lit(eps), 6)
    counts
      .withColumn("noisy_n", round(col("n") + noise, 6))
      .withColumn("released_n",
        greatest(lit(0L), round(col("noisy_n"), 0).cast("long")))
  }
}
